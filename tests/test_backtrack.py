"""Device (Mosaic) chain backtracking vs the host oracle.

The kernel (ops/backtrack_pallas.py) must reproduce
ops/regions.py:backtrack_chains exactly, modulo its documented K-pass
cap, and the end-to-end pipeline with device_backtrack="on" must
produce the same mappings as the host-backtrack path (identical
coordinates/NM always; identical CIGARs for reads short enough not to
be segmented — cut anchors are chosen end->start on device vs
start->end on host, which can shift an indel by a base at a segment
boundary of a long read without changing score or NM).
"""
import numpy as np
import pytest

import jax.numpy as jnp

import mappy_rs_tpu
from mappy_rs_tpu.ops.backtrack_pallas import (
    N_FIXED,
    SEG_LEN,
    backtrack_chains_pallas,
)
from mappy_rs_tpu.ops.regions import backtrack_chains


def _host_capped(f1, p1, v1, min_cnt, min_sc, k_passes):
    """backtrack_chains with the kernel's K-pass cap: each processed
    candidate end (kept OR rejected) consumes one pass."""
    n = len(f1)
    cand = np.nonzero((f1 >= min_sc) & v1)[0]
    order = cand[np.lexsort((-cand, -f1[cand]))]
    used = np.zeros(n, bool)
    chains = []
    passes = 0
    for end in order:
        if used[end]:
            continue
        if passes >= k_passes:
            break
        passes += 1
        path = []
        i = int(end)
        while i >= 0 and not used[i]:
            path.append(i)
            used[i] = True
            i = int(p1[i])
        sc = int(f1[end]) - (int(f1[i]) if i >= 0 else 0)
        if len(path) >= min_cnt and sc >= min_sc:
            chains.append((sc, path[::-1]))
    return chains


def _random_chain_dp(rng, B, A):
    """Random but structurally valid chain DP output: p[i] < i within
    the same (rev, rid) group, f accumulating along links."""
    f = np.zeros((B, A), np.int32)
    p = np.full((B, A), -1, np.int32)
    valid = np.zeros((B, A), bool)
    qpos = np.zeros((B, A), np.int32)
    rpos = np.zeros((B, A), np.int32)
    rev = np.zeros((B, A), np.int32)
    rid = np.zeros((B, A), np.int32)
    span = np.full((B, A), 15, np.int32)
    for b in range(B):
        n = int(rng.integers(10, A))
        valid[b, :n] = True
        qp = np.sort(rng.integers(0, 2000, n)).astype(np.int32)
        qpos[b, :n] = qp
        rpos[b, :n] = qp + rng.integers(-5, 6, n)
        rev[b, :n] = rng.integers(0, 2, n)
        rid[b, :n] = rng.integers(0, 3, n)
        for i in range(n):
            cands = [
                j for j in range(max(0, i - 8), i)
                if rev[b, j] == rev[b, i] and rid[b, j] == rid[b, i]
            ]
            if cands and rng.random() < 0.8:
                j = int(rng.choice(cands))
                p[b, i] = j
                f[b, i] = f[b, j] + int(rng.integers(5, 20))
            else:
                f[b, i] = int(rng.integers(5, 60))
    return f, p, valid, qpos, rpos, rev, rid, span


@pytest.mark.parametrize("seed", [0, 1])
def test_kernel_matches_host_oracle(seed):
    rng = np.random.default_rng(seed)
    B, A, K, seg_cuts = 8, 128, 6, 4
    min_cnt, min_sc = 3, 40
    f, p, valid, qpos, rpos, rev, rid, span = _random_chain_dp(rng, B, A)
    anchors = {
        "valid": jnp.asarray(valid),
        "rev": jnp.asarray(rev),
        "rid": jnp.asarray(rid),
        "rpos": jnp.asarray(rpos),
        "qpos": jnp.asarray(qpos),
        "span": jnp.asarray(span),
    }
    out = np.asarray(
        backtrack_chains_pallas(
            anchors, jnp.asarray(f), jnp.asarray(p), K, seg_cuts,
            min_cnt, min_sc,
        )
    )
    for b in range(B):
        host = _host_capped(f[b], p[b], valid[b], min_cnt, min_sc, K)
        dev = [row for row in out[b] if row[0] >= 0]
        assert len(dev) == len(host)
        for (sc, path), row in zip(host, dev):
            first, last = path[0], path[-1]
            assert list(row[:N_FIXED]) == [
                sc, len(path), rev[b, first], rid[b, first],
                rpos[b, first], rpos[b, last], qpos[b, first],
                qpos[b, last], span[b, first],
            ]
            # cuts: on-path anchors, descending qpos, >= SEG_LEN apart
            cuts = row[N_FIXED:]
            pairs = [
                (int(cuts[i]), int(cuts[i + 1]))
                for i in range(0, len(cuts), 2)
                if cuts[i] >= 0
            ]
            on_path = {
                (int(qpos[b, i]), int(rpos[b, i])) for i in path
            }
            prev = int(qpos[b, last])
            for qp, rp in pairs:
                assert (qp, rp) in on_path
                assert prev - qp >= SEG_LEN
                prev = qp


def test_pipeline_device_backtrack_matches_host(tmp_path):
    rng = np.random.default_rng(3)
    genome = "".join(rng.choice(list("ACGT"), size=60_000))
    fa = tmp_path / "g.fa"
    fa.write_text(f">chr\n{genome}\n")
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    reads = []
    for length in [700] * 6 + [1700] * 2:
        start = int(rng.integers(0, len(genome) - length))
        read = list(genome[start : start + length])
        for pos in rng.choice(length, length // 25, replace=False):
            read[pos] = "ACGT"[("ACGT".index(read[pos]) + 1) % 4]
        read = "".join(read)
        if rng.random() < 0.5:
            read = "".join(comp[c] for c in reversed(read))
        reads.append(read)

    al_host = mappy_rs_tpu.Aligner(str(fa))
    al_dev = mappy_rs_tpu.Aligner(str(fa))
    al_dev._engine.cfg = al_dev._engine.cfg.replace(device_backtrack="on")
    for read in reads:
        hs = al_host.map(read, cs=True)
        ds = al_dev.map(read, cs=True)
        assert len(hs) == len(ds) >= 1
        for h, d in zip(hs, ds):
            assert (h.ctg, h.r_st, h.r_en, h.q_st, h.q_en, h.strand) == (
                d.ctg, d.r_st, d.r_en, d.q_st, d.q_en, d.strand
            )
            assert (h.NM, h.mlen, h.blen, h.mapq) == (
                d.NM, d.mlen, d.blen, d.mapq
            )
            if len(read) <= 2 * SEG_LEN:  # unsegmented: bit-identical
                assert h.cigar_str == d.cigar_str and h.cs == d.cs
