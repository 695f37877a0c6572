"""HPC (homopolymer-compressed) sketching: map-pb preset end-to-end."""
import numpy as np
import pytest

import mappy_rs_tpu
from mappy_rs_tpu.index.sketch_host import sketch_host
from mappy_rs_tpu.utils.seqcodes import encode


def _hp_genome(rng, n):
    parts = []
    while sum(len(p) for p in parts) < n:
        parts.append(
            str(rng.choice(list("ACGT"))) * int(rng.integers(1, 6))
        )
    return "".join(parts)[:n]


def test_hpc_vectorized_sketch_matches_oracle():
    import jax.numpy as jnp

    from mappy_rs_tpu.ops.sketch import compress_hpc, hpc_spans, sketch_compact

    rng = np.random.default_rng(4)
    tests = [_hp_genome(rng, int(rng.integers(30, 250))) for _ in range(25)]
    k, w = 19, 10
    L = max(len(s) for s in tests)
    B = len(tests)
    codes = np.full((B, L), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    for i, s in enumerate(tests):
        c = encode(s)
        codes[i, : len(c)] = c
        lens[i] = len(c)
    cc, cl, run_end, run_len = compress_hpc(codes, lens)
    spans = hpc_spans(run_len, k)
    out = sketch_compact(
        jnp.asarray(cc), jnp.asarray(cl), k, w, 256,
        force_inf=jnp.asarray(spans >= 256),
        pos_map=jnp.asarray(run_end),
        spans=jnp.asarray(spans),
    )
    for i, s in enumerate(tests):
        oracle = sorted(
            (key, pos, z, sp)
            for key, _, pos, z, sp in sketch_host(encode(s), k, w, 0, is_hpc=True)
        )
        n = int(out["n"][i])
        got = sorted(
            (
                (int(out["key_hi"][i, j]) << 32) | int(out["key_lo"][i, j]),
                int(out["pos"][i, j]),
                int(out["strand"][i, j]),
                int(out["span"][i, j]),
            )
            for j in range(n)
        )
        assert oracle == got, f"read {i}"


def test_map_pb_preset_end_to_end(tmp_path):
    """map-pb (HPC, k=19): PB-like reads with homopolymer-length errors
    must map correctly — HPC sketching is insensitive to run-length
    noise by construction."""
    rng = np.random.default_rng(6)
    genome = _hp_genome(rng, 60_000)
    fa = tmp_path / "g.fa"
    fa.write_text(f">g\n{genome}\n")
    al = mappy_rs_tpu.Aligner(str(fa), preset="map-pb")
    assert al.k == 19
    # reads with homopolymer run-length errors (the PB error mode)
    n_ok = 0
    for _ in range(15):
        start = int(rng.integers(0, len(genome) - 1200))
        src = genome[start : start + 1200]
        out = []
        i = 0
        while i < len(src):
            j = i
            while j < len(src) and src[j] == src[i]:
                j += 1
            run = j - i
            if rng.random() < 0.35 and run > 1:
                run += int(rng.integers(-1, 2))
            out.append(src[i] * max(run, 1))
            i = j
        read = "".join(out)
        hits = al.map(read)
        if hits and abs(hits[0].target_start - start) < 120:
            n_ok += 1
    assert n_ok >= 13, f"only {n_ok}/15 HPC reads mapped correctly"


def test_hpc_index_build_host_vs_device(tmp_path):
    from mappy_rs_tpu.config import IndexOptions
    from mappy_rs_tpu.index.build import build_index

    rng = np.random.default_rng(8)
    seqs = [("c1", _hp_genome(rng, 5000)), ("c2", _hp_genome(rng, 3000))]
    opts = IndexOptions(k=19, w=10, flag=0x1)
    a = build_index(seqs, opts, use_device=True)
    b = build_index(seqs, opts, use_device=False)
    assert np.array_equal(a.keys, b.keys)
    assert np.array_equal(a.positions, b.positions)
