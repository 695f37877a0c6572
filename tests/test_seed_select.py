"""Seed occurrence thinning / rescue (minimap2 mm_seed_select;
VERDICT r1 missing #6).

Two layers:
 1. a property test of the vectorized device formulation
    (ops/lookup.py::seed_select_keep) against a direct scalar port of
    the minimap2 algorithm (seed.c mm_seed_select + the
    mm_collect_matches gate), on randomized seed lists;
 2. an end-to-end behavioural test: a read drawn from an interspersed
    genome-wide repeat (every seed over mid_occ) is unmappable with
    thinning off and maps once rescue re-enables its lowest-occurrence
    seeds — on BOTH the device front end and the native CPU front end,
    with identical coordinates.

Reference contract: /root/reference/src/lib.rs:482 reaches this logic
through mm_map on every .map() call (SURVEY.md §2b N8).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from mappy_rs_tpu import Aligner, native
from mappy_rs_tpu.ops.lookup import seed_select_keep

MAX_HIGH = 128  # minimap2 MAX_MAX_HIGH_OCC


def oracle_keep(pos, cnt, qlen, mid_occ, occ_dist, max_max_occ):
    """Scalar mm_seed_select: returns keep mask over seeds (hits only),
    given ascending query end positions `pos` and occurrences `cnt`."""
    n = len(pos)
    keep = [c <= mid_occ for c in cnt]
    if not (occ_dist > 0 and max_max_occ > mid_occ):
        return keep
    last0 = -1
    for i in range(n + 1):
        if i == n or cnt[i] <= mid_occ:
            if i - last0 > 1:
                ps = 0 if last0 < 0 else pos[last0]
                pe = qlen if i == n else pos[i]
                mh = min(int((pe - ps) / occ_dist + 0.499), MAX_HIGH)
                if mh > 0:
                    cand = sorted(
                        (cnt[j], j)
                        for j in range(last0 + 1, i)
                        if cnt[j] <= max_max_occ
                    )
                    for c, j in cand[:mh]:
                        keep[j] = True
            last0 = i
    return keep


@pytest.mark.parametrize("seed", range(6))
def test_device_formulation_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    B, M = 4, 96
    qlen = 3000
    mid_occ, occ_dist, max_max_occ = 12, 300, 200
    pos = np.full((B, M), -1, np.int32)
    cnt = np.zeros((B, M), np.int32)
    found = np.zeros((B, M), bool)
    per_row = []
    for b in range(B):
        m = int(rng.integers(8, M))
        p = np.sort(rng.choice(np.arange(14, qlen), size=m, replace=False))
        # mixture: mostly low-occ, clusters of high-occ, some > max_max
        c = rng.choice(
            [1, 3, mid_occ, mid_occ + 1, 40, 150, 190, 500, 4000],
            size=m,
            p=[0.25, 0.1, 0.05, 0.1, 0.15, 0.15, 0.1, 0.05, 0.05],
        ).astype(np.int32)
        # some slots present but not found (no index hit)
        hit = rng.random(m) > 0.15
        pos[b, :m] = p
        cnt[b, :m] = np.where(hit, c, 0)
        found[b, :m] = hit
        per_row.append((p[hit], c[hit]))
    keep_dev, rescued_dev = seed_select_keep(
        jnp.asarray(pos), jnp.asarray(cnt), jnp.asarray(found),
        jnp.full((B,), qlen, jnp.int32), jnp.int32(mid_occ),
        occ_dist, max_max_occ,
    )
    keep_dev = np.asarray(keep_dev)
    rescued_dev = np.asarray(rescued_dev)
    for b in range(B):
        p, c = per_row[b]
        want = oracle_keep(
            list(p), list(c), qlen, mid_occ, occ_dist, max_max_occ
        )
        got = keep_dev[b][found[b]]
        assert got.tolist() == want, f"row {b}"
        # rescued == kept high-occ seeds
        want_resc = [w and cc > mid_occ for w, cc in zip(want, c)]
        assert rescued_dev[b][found[b]].tolist() == want_resc
        # nothing kept on not-found slots
        assert not keep_dev[b][~found[b]].any()


@pytest.fixture(scope="module")
def repeat_genome():
    """40 interspersed copies of a 1.6kb segment: a read of one copy
    has every seed at genome occurrence ~40, in-read occurrence 1 (so
    the q_occ_frac query filter does not fire — only mid_occ does)."""
    rng = np.random.default_rng(3)
    unit = "".join(rng.choice(list("ACGT"), size=1600))
    parts = []
    for _ in range(40):
        parts.append(unit)
        parts.append("".join(rng.choice(list("ACGT"), size=400)))
    genome = "".join(parts)
    return genome, unit


def _seed_opts(al):
    # force the repeat's seeds over the cutoff regardless of the
    # computed quantile (tiny synthetic genome), and tighten occ_dist:
    # the preset default 500 rescues only floor(1500/500+.499)=3 seeds
    # on this 1.5kb read — a 3-anchor chain scores below
    # min_chain_score=40, so use 100 (15 rescued seeds, score 76) to
    # test the mechanism rather than the threshold margin.
    al._engine.opt.mid_occ = 12
    al._engine.opt.occ_dist = 100
    return al


def test_rescue_maps_repeat_read_device(repeat_genome):
    genome, unit = repeat_genome
    read = unit[50:1550]
    al_off = _seed_opts(Aligner(seq=genome, preset="map-ont"))
    al_off._engine.opt.occ_dist = 0
    assert al_off.map(read) == [], "thinning off: repeat read must fail"
    al_on = _seed_opts(Aligner(seq=genome, preset="map-ont"))
    assert al_on._engine._seed_select_params()[0] > 0
    hits = al_on.map(read)
    assert hits, "occ rescue must seed the repeat read"
    m = hits[0]
    # maps to SOME copy of the unit, full-ish query coverage
    assert (m.target_start - 50) % 2000 < 120 or \
        (m.target_start - 50) % 2000 > 1880
    assert m.query_end - m.query_start > 1000


def test_rescue_cpu_front_end_matches_device(repeat_genome):
    if not native.available():
        pytest.skip("native lib unavailable")
    genome, unit = repeat_genome
    read = unit[50:1550]
    al_dev = _seed_opts(Aligner(seq=genome, preset="map-ont"))
    al_cpu = _seed_opts(Aligner(seq=genome, preset="map-ont"))
    al_cpu._engine.cfg.front_end_backend = "cpu"
    al_cpu._engine.cfg.extension_backend = "host"
    h_dev = al_dev.map(read)
    h_cpu = al_cpu.map(read)
    assert h_dev and h_cpu
    d, c = h_dev[0], h_cpu[0]
    assert (d.ctg, d.r_st, d.r_en, d.q_st, d.q_en, d.strand) == (
        c.ctg, c.r_st, c.r_en, c.q_st, c.q_en, c.strand
    )
