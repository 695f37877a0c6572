"""Adversarial mapq/primary constructions (VERDICT r2 weak #6).

mm_set_mapq's behavior is provable on crafted repeat families without
a minimap2 oracle: specific genome constructions pin the formula's
inputs (dp_max2/dp_max ratio, rep_len, sub count) so the output lands
in a provable band — and the two independent front ends must agree
EXACTLY on every value (the formula runs downstream of both).

Formula (ops/regions.py set_mapq, mirroring minimap2 map.c):
  mapq = identity * pen * 40 * (1 - dp_max2/dp_max) * ln(score),
  pen = min(pen_s1 * uniq_ratio, pen_cm),
  uniq_ratio = sum_primary_scores / (sum + rep_len),
  minus 4.343*ln(n_sub+1)+0.499 when secondaries exist, clamp [0,60].
"""
import numpy as np
import pytest

import mappy_rs_tpu
from mappy_rs_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib needed"
)

BASES = "ACGT"


def _rand(rng, n):
    return "".join(rng.choice(list(BASES), size=n))


def _aligners(genome):
    out = []
    for be in ("device", "cpu"):
        al = mappy_rs_tpu.Aligner(seq=genome, preset="map-ont")
        al._engine.cfg.front_end_backend = be
        al._engine.cfg.extension_backend = "host"
        out.append(al)
    return out


def _mapqs(al, read):
    return [(m.ctg, m.r_st, m.mapq, m.is_primary) for m in al.map(read)]


def test_unique_clean_read_hits_cap_60():
    """A clean unique 800bp read: identity=1, pen=1, no secondaries,
    40*ln(score) >> 60 -> mapq must clamp to exactly 60 on BOTH
    front ends."""
    rng = np.random.default_rng(31)
    genome = _rand(rng, 60_000)
    read = genome[20_000:20_800]
    for al in _aligners(genome):
        hits = _mapqs(al, read)
        assert hits and hits[0][2] == 60 and hits[0][3], hits


def test_exact_duplicate_copies_force_mapq_0():
    """Two IDENTICAL 800bp copies: the secondary's DP score equals the
    primary's (dp_max2 == dp_max -> the (1 - x) discriminator is 0),
    so mapq is provably exactly 0."""
    rng = np.random.default_rng(32)
    unit = _rand(rng, 800)
    genome = (
        _rand(rng, 12_000) + unit + _rand(rng, 20_000) + unit
        + _rand(rng, 12_000)
    )
    for al in _aligners(genome):
        hits = _mapqs(al, unit)
        assert len(hits) >= 2, hits
        assert hits[0][2] == 0 and hits[0][3], hits
        assert not hits[1][3] and hits[1][2] == 0, hits


def test_diverged_copy_discriminator_band():
    """Primary copy exact, decoy copy ~1.2% diverged: dp_max2/dp_max
    ~0.96 (10 mismatches cost ~6 each of the ~1600 dp max; fewer
    and the chain-level pri_ratio=0.8 filter would drop the decoy
    before extension), so
    40*(1-x)*ln(score) lands strictly inside (0, 60) — the dp_max2
    discriminator is doing the work.  Both front ends must agree on
    the EXACT value."""
    rng = np.random.default_rng(33)
    unit = list(_rand(rng, 800))
    decoy = unit.copy()
    for p in rng.choice(800, size=10, replace=False):
        decoy[p] = BASES[(BASES.index(decoy[p]) + 1) % 4]
    genome = (
        _rand(rng, 12_000) + "".join(unit) + _rand(rng, 20_000)
        + "".join(decoy) + _rand(rng, 12_000)
    )
    vals = []
    for al in _aligners(genome):
        hits = _mapqs(al, "".join(unit))
        assert hits and hits[0][3], hits
        vals.append(hits[0][2])
    assert vals[0] == vals[1], vals
    assert 0 < vals[0] < 60, vals


def test_rep_len_attenuation_lowers_mapq():
    """A read whose first 600bp sit in a 600-copy repeat family:
    those seeds are occ-filtered into rep_len, attenuating
    uniq_ratio = score/(score+rep_len) ~ 0.3, which provably pulls
    mapq below the clamp (the repeat-free control stays at 60).
    Exact agreement across front ends on the attenuated value.

    mid_occ is pinned at 50 on both aligners: the mid_occ_frac
    QUANTILE adapts to just above a uniform repeat's occurrence
    (601 copies -> mid_occ 602, nothing filtered — minimap2's own
    semantics), so isolating the attenuation path needs a fixed
    threshold, exactly like minimap2's -f/--mid-occ override."""
    rng = np.random.default_rng(34)
    sat = _rand(rng, 600)  # saturating repeat unit
    uniq_part = _rand(rng, 250)
    # genome A: read = [repeat unit][unique part], repeat has ~600
    # copies elsewhere so its seeds exceed the pinned mid_occ
    genome_a = (
        sat * 600 + _rand(rng, 5_000) + sat + uniq_part + _rand(rng, 20_000)
    )
    read = sat + uniq_part
    # control genome: the read region is fully unique
    ctl = _rand(rng, len(sat)) + uniq_part
    genome_b = _rand(rng, 5_000) + ctl + _rand(rng, 20_000)
    vals = []
    for al in _aligners(genome_a):
        al._engine.opt.mid_occ = 50
        hits = _mapqs(al, read)
        assert hits and hits[0][3], hits
        vals.append(hits[0][2])
    ctl_vals = []
    for al in _aligners(genome_b):
        al._engine.opt.mid_occ = 50
        hits = _mapqs(al, ctl)
        assert hits, hits
        ctl_vals.append(hits[0][2])
    assert vals[0] == vals[1], vals
    assert ctl_vals[0] == ctl_vals[1], ctl_vals
    assert ctl_vals[0] == 60, ctl_vals
    assert vals[0] < 60, (vals, ctl_vals)


def test_multi_secondary_penalty_tiers():
    """3 copies at graded divergence (10/14 mismatches — low enough
    that both decoys survive the chain-level pri_ratio=0.8 filter):
    the primary carries n_sub=2, so the -int(4.343*ln(3)+0.499) = -5
    penalty applies instead of the 2-copy case's -3, while dp_max2
    (the 10-mismatch decoy, present in both genomes) is unchanged —
    mapq drops by exactly the penalty difference.  Exact agreement
    across front ends."""
    rng = np.random.default_rng(35)
    unit = list(_rand(rng, 800))

    def diverge(n):
        d = unit.copy()
        for p in rng.choice(800, size=n, replace=False):
            d[p] = BASES[(BASES.index(d[p]) + 1) % 4]
        return "".join(d)

    d10 = diverge(10)  # shared decoy: same dp_max2 in both genomes
    two = (
        _rand(rng, 10_000) + "".join(unit) + _rand(rng, 15_000)
        + d10 + _rand(rng, 10_000)
    )
    three = (
        _rand(rng, 10_000) + "".join(unit) + _rand(rng, 15_000)
        + d10 + _rand(rng, 15_000) + diverge(14)
        + _rand(rng, 10_000)
    )
    read = "".join(unit)
    v2, v3 = [], []
    for al in _aligners(two):
        v2.append(_mapqs(al, read)[0][2])
    for al in _aligners(three):
        hits = _mapqs(al, read)
        assert len(hits) >= 3, hits
        v3.append(hits[0][2])
    assert v2[0] == v2[1] and v3[0] == v3[1], (v2, v3)
    assert v3[0] < v2[0], (v3, v2)
