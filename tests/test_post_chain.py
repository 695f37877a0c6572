"""Fused C++ post-chain record emission (native/post_chain.cc) parity.

The fast path runs regions + set_parent/select_sub + extension +
finalize + mapq in ONE native call per batch; the stage-by-stage
Python pipeline (ops/regions.py + models/pipeline.py) is the oracle.
Every Region field — coordinates, scores, parent/subsc/n_sub, mapq,
CIGAR, cs/MD — must be bit-identical, including reads that take the
zdrop-split fallback (mm_gen_regs/mm_set_parent/mm_select_sub/
mm_set_mapq behavior behind /root/reference/src/lib.rs:482-509).
"""
import numpy as np
import pytest

import mappy_rs_tpu
from mappy_rs_tpu import native


def _simulate(rng, genome, n, length, err):
    from bench import simulate

    return simulate(rng, genome, n, length, err)


def _key(r):
    cg = r.cigar
    cg = tuple(np.asarray(cg).tolist()) if cg is not None else ()
    return (
        r.rev, r.rid, r.qs, r.qe, r.rs, r.re, r.score, r.cnt, r.id,
        r.parent, r.subsc, r.n_sub, r.dp_score, r.dp_max2, r.mapq,
        r.mlen, r.blen, r.nm, cg, r.cs, r.md,
    )


def _run(genome, reads, post_chain, fe, **map_kw):
    al = mappy_rs_tpu.Aligner(seq=genome, preset="map-ont")
    al._engine.cfg.post_chain_native = post_chain
    al._engine.cfg.front_end_backend = fe
    return al._engine.map_batch(reads, **map_kw)


@pytest.mark.skipif(not native.available(), reason="native lib required")
@pytest.mark.parametrize("fe", ["cpu", "device"])
def test_post_chain_parity(fe):
    rng = np.random.default_rng(3)
    genome = "".join(rng.choice(list("ACGT"), size=300_000))
    reads, _ = _simulate(rng, genome, 80, 1000, 0.05)
    # a zdrop-split chimera (fallback path) and a reverse-strand read
    garbage = "".join(rng.choice(list("ACGT"), size=500))
    reads.append(genome[2000:2600] + garbage + genome[3100:3700])
    comp = str.maketrans("ACGT", "TGCA")
    reads.append(genome[5000:6000].translate(comp)[::-1])
    fast = _run(genome, reads, True, fe, cs=True, md=True)
    py = _run(genome, reads, False, fe, cs=True, md=True)
    for i, (ra, rb) in enumerate(zip(fast, py)):
        assert [_key(r) for r in ra] == [_key(r) for r in rb], f"read {i}"


@pytest.mark.skipif(not native.available(), reason="native lib required")
def test_post_chain_zdrop_fallback_still_splits():
    rng = np.random.default_rng(8)
    genome = "".join(rng.choice(list("ACGT"), size=10_000))
    garbage = "".join(rng.choice(list("ACGT"), size=500))
    read = genome[2000:2600] + garbage + genome[3100:3700]
    al = mappy_rs_tpu.Aligner(seq=genome, preset="map-ont")
    hits = al.map(read)
    assert len(hits) >= 2
