"""zdrop alignment splitting (VERDICT r1 #3 / SURVEY §2b N10).

minimap2 semantics (ksw2 KSW_EZ_APPROX_DROP behind every reference
`.map()`, /root/reference/src/lib.rs:482): when the gap-filling global
DP falls more than `zdrop` below its running max, the alignment is
truncated at the max cell and the remainder becomes a separate
mapping — the chimeric/SV behavior.
"""
import numpy as np

import mappy_rs_tpu


def _mk(seed=8, glen=10_000):
    rng = np.random.default_rng(seed)
    genome = "".join(rng.choice(list("ACGT"), size=glen))
    return rng, genome


def test_divergent_patch_splits_into_two_mappings():
    rng, genome = _mk()
    # read: 600bp match + 500bp garbage replacing 500bp of reference +
    # 600bp match — ONE chain bridges it (diagonal preserved), but the
    # cheapest path through the patch (a dual-affine long insertion,
    # q2 + L*e2 = 524) still falls > zdrop=400 below the running max
    # (shorter patches are absorbed as a long indel WITHOUT splitting,
    # exactly like ksw2 — see test_short_patch_absorbed below)
    garbage = "".join(rng.choice(list("ACGT"), size=500))
    read = genome[2000:2600] + garbage + genome[3100:3700]
    al = mappy_rs_tpu.Aligner(seq=genome, preset="map-ont")
    hits = al.map(read)
    assert len(hits) >= 2, [
        (h.target_start, h.target_end, h.query_start, h.query_end)
        for h in hits
    ]
    hits = sorted(hits, key=lambda h: h.target_start)
    a, b = hits[0], hits[1]
    assert a.target_start >= 1990 and a.target_start <= 2010
    assert abs(a.target_end - 2600) < 60
    assert abs(b.target_start - 3100) < 60
    assert b.target_end <= 3710 and b.target_end >= 3640
    # query intervals land on the two match blocks
    assert a.query_end <= 660
    assert b.query_start >= 1050
    # both survive primary marking (disjoint query intervals)
    assert a.is_primary and b.is_primary
    # the split pieces carry sane identity stats
    assert a.NM < 30 and b.NM < 30
    # metrics observability
    assert al.metrics.get("zdrop_splits", 0) >= 1


def test_short_patch_absorbed():
    """A 250bp divergent patch is CHEAPER as a long dual-affine indel
    (q2 + L*e2 < zdrop), so it must NOT split — one mapping with a
    long gap, matching ksw2's cost model."""
    rng, genome = _mk(seed=11)
    garbage = "".join(rng.choice(list("ACGT"), size=250))
    read = genome[2000:2600] + garbage + genome[2850:3450]
    al = mappy_rs_tpu.Aligner(seq=genome, preset="map-ont")
    hits = al.map(read)
    assert len(hits) == 1, [(h.target_start, h.target_end) for h in hits]
    assert hits[0].target_start == 2000
    assert abs(hits[0].target_end - 3450) < 10


def test_long_deletion_aligns_through():
    """ksw2's zdrop allowance grows with the diagonal offset from the
    max cell at the long-gap extension slope, so a pure deletion whose
    cost exceeds zdrop (q2 + L*e2 = 474 > 400) still aligns THROUGH as
    one mapping with a long D op — only diagonal-constant divergence
    (substitutions) dies at zdrop.  An unadjusted `max - diag_best >
    zdrop` criterion wrongly splits this read."""
    rng, genome = _mk(seed=12)
    # 450bp deletion: within map-ont's chain band (bw=500) so one
    # chain bridges it, and dual-affine cost 24 + 450*1 > zdrop=400
    read = genome[2000:2600] + genome[3050:3650]
    al = mappy_rs_tpu.Aligner(seq=genome, preset="map-ont")
    hits = al.map(read)
    assert len(hits) == 1, [(h.target_start, h.target_end) for h in hits]
    m = hits[0]
    assert m.target_start == 2000 and abs(m.target_end - 3650) < 10
    assert any(
        ln >= 440 and op == 2 for ln, op in m.cigar
    ), m.cigar_str
    assert al.metrics.get("zdrop_splits", 0) == 0


def test_clean_reads_never_split():
    rng, genome = _mk(seed=9)
    al = mappy_rs_tpu.Aligner(seq=genome, preset="map-ont")
    for _ in range(5):
        start = int(rng.integers(0, len(genome) - 800))
        read = genome[start : start + 800]
        hits = al.map(read)
        assert len(hits) == 1
        assert hits[0].NM == 0
    assert al.metrics.get("zdrop_splits", 0) == 0


def test_split_remainder_can_split_again():
    """Two divergent patches -> three mappings (bounded split rounds)."""
    rng, genome = _mk(seed=10)
    g1 = "".join(rng.choice(list("ACGT"), size=500))
    g2 = "".join(rng.choice(list("ACGT"), size=500))
    read = (
        genome[4000:4600] + g1 + genome[5100:5700] + g2
        + genome[6200:6800]
    )
    al = mappy_rs_tpu.Aligner(seq=genome, preset="map-ont")
    hits = al.map(read)
    assert len(hits) >= 3, [
        (h.target_start, h.target_end) for h in hits
    ]
    starts = sorted(h.target_start for h in hits)
    assert abs(starts[0] - 4000) < 20
    assert abs(starts[1] - 5100) < 60
    assert abs(starts[2] - 6200) < 60
