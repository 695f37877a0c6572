#!/usr/bin/env python
"""Trial: gather-lean lookup formulations vs the shipped ones.

A) search: bucket-WINDOW compare (one contiguous [W,4] AoS gather per
   query + in-register compare) vs ranged binary search (rounds x
   random gathers).
B) expansion: scatter-max + cummax (one scatter, one cumsum) vs
   row-wise binary searchsorted (9 rounds of 2-D gathers).
C) pos fetch: AoS [m, 2] single gather vs two separate gathers.
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np


def bench_call(fn, nit=10):
    import jax

    jax.block_until_ready(fn())
    t0 = time.time()
    outs = [fn() for _ in range(nit)]
    jax.block_until_ready(outs)
    return (time.time() - t0) / nit


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import ERROR_RATE, GENOME_LEN, READ_LEN, simulate
    from mappy_rs_tpu import Aligner
    from mappy_rs_tpu.models.pipeline import _pow2_at_least
    from mappy_rs_tpu.ops import lookup as LK
    from mappy_rs_tpu.ops.sketch import sketch_compact
    from mappy_rs_tpu.utils.seqcodes import encode

    rng = np.random.default_rng(0)
    genome = bytes(
        np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, GENOME_LEN)]
    ).decode()
    reads, _ = simulate(rng, genome, 512, READ_LEN, ERROR_RATE)
    al = Aligner(seq=genome, preset="map-ont")
    eng = al._engine
    idx = eng.index
    codes = [encode(s) for s in reads]
    k, w = idx.k, idx.w
    L, B = 1024, 256
    M = max(64, L // max(w // 2, 1))
    A = _pow2_at_least(max(256, int(L * eng.cfg.anchors_per_base)))
    batch = np.full((B, L), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    for bi in range(B):
        c = codes[bi % len(codes)]
        batch[bi, : len(c)] = c
        lens[bi] = len(c)
    dev = eng.dev
    cb, lb = jnp.asarray(batch), jnp.asarray(lens)
    I32, U32 = jnp.int32, jnp.uint32

    mins_j = jax.tree.map(jnp.asarray, jax.jit(
        partial(sketch_compact, k=k, w=w, max_minimizers=M)
    )(cb, lb))
    jax.block_until_ready(mins_j)

    # ---- build the window layout on host -------------------------------
    n = len(idx.keys)
    eff = int(idx.keys[-1]).bit_length()
    for bb in range(14, 26):
        shift = max(eff - bb, 0)
        bcnt = np.bincount(
            (idx.keys >> np.uint64(shift)).astype(np.int64),
            minlength=1 << bb,
        )
        mx = int(bcnt.max())
        if mx <= 16 or bb == 25:
            break
    W = 1
    while W < mx:
        W <<= 1
    W = max(W, 8)
    print(f"n={n} eff={eff} bb={bb} max_bucket={mx} W={W}", flush=True)
    bstart = np.concatenate([[0], np.cumsum(bcnt)]).astype(np.int32)
    n_pad = ((n + W + 127) // 128) * 128
    meta = np.zeros((n_pad, 4), np.int32)
    meta[:, 0] = -1  # sentinel key (minimizer hashes < 2^30 here)
    meta[:n, 0] = (idx.keys & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
    meta[:n, 1] = idx.key_offsets[:n].astype(np.int32)
    meta[:n, 2] = (idx.key_offsets[1:] - idx.key_offsets[:-1]).astype(np.int32)
    meta_d = jnp.asarray(meta)
    bstart_d = jnp.asarray(bstart)
    mid_occ = int(eng.opt.mid_occ)

    # AoS positions
    m_pos = len(idx.positions)
    pos2 = np.zeros((max(m_pos, 8), 2), np.int32)
    pos2[:m_pos, 0] = (idx.positions >> np.uint64(32)).astype(np.int32)
    pos2[:m_pos, 1] = (
        idx.positions & np.uint64(0xFFFFFFFF)
    ).astype(np.uint32).view(np.int32)
    pos2_d = jnp.asarray(pos2)

    # ---- A) window search ---------------------------------------------
    @partial(jax.jit, static_argnames=("bb", "shift", "W"))
    def search_window(mins, bb, shift, W):
        q_lo = mins["key_lo"]
        b = jnp.minimum(
            q_lo >> U32(shift), U32((1 << bb) - 1)
        ).astype(I32)
        start = bstart_d[b]
        width = bstart_d[b + 1] - start
        win_idx = start[:, :, None] + jnp.arange(W, dtype=I32)[None, None, :]
        winm = meta_d[win_idx]  # [B, M, W, 4]
        qk = q_lo.view(jnp.int32) if hasattr(q_lo, "view") else q_lo
        qk = q_lo.astype(jnp.uint32).view(jnp.int32)
        hit = (winm[..., 0] == qk[:, :, None]) & (
            jnp.arange(W, dtype=I32)[None, None, :] < width[:, :, None]
        )
        found = hit.any(axis=2) & (mins["pos"] >= 0)
        off = jnp.max(jnp.where(hit, winm[..., 1], 0), axis=2)
        cnt0 = jnp.max(jnp.where(hit, winm[..., 2], 0), axis=2)
        cnt = jnp.where(found & (cnt0 <= mid_occ), cnt0, 0)
        return cnt, off, found

    f_a = lambda: search_window(mins_j, bb, shift, W)
    t = bench_call(f_a)
    print(f"A window search+meta:   {t*1e3:6.1f} ms", flush=True)

    # reference: current binary search + meta
    @jax.jit
    def search_ref(mins):
        q_hi, q_lo = mins["key_hi"], mins["key_lo"]
        s = dev.bucket_shift
        b_u = (q_lo >> U32(s)) | (q_hi << U32(32 - s)) if 0 < s < 32 \
            else (q_lo if s == 0 else q_hi >> U32(s - 32))
        b = jnp.minimum(b_u, U32((1 << dev.bucket_bits) - 1)).astype(I32)
        ix = LK._lower_bound_2key_ranged(
            dev.key_hi, dev.key_lo, q_hi, q_lo,
            dev.bucket_start[b], dev.bucket_start[b + 1],
            dev.bucket_rounds, keys32=True,
        )
        ix_c = jnp.minimum(ix, dev.key_lo.shape[0] - 1)
        found = (ix < dev.n_keys) & (dev.key_lo[ix_c] == q_lo) & (
            mins["pos"] >= 0
        )
        cnt = jnp.where(found, dev.counts[ix_c], 0)
        cnt = jnp.where(cnt > mid_occ, 0, cnt)
        return cnt, dev.offsets[ix_c], found

    t = bench_call(lambda: search_ref(mins_j))
    print(f"REF binsearch+meta:     {t*1e3:6.1f} ms", flush=True)

    cnt_a, off_a, fnd_a = jax.device_get(f_a())
    cnt_r, off_r, fnd_r = jax.device_get(search_ref(mins_j))
    ok = (np.array_equal(cnt_a, cnt_r)
          and np.array_equal(np.where(cnt_a > 0, off_a, 0),
                             np.where(cnt_r > 0, off_r, 0)))
    print(f"A == REF: {ok}", flush=True)

    # ---- B) expansion --------------------------------------------------
    cnt_d = jnp.asarray(cnt_r)
    off_d = jnp.asarray(off_r)

    @jax.jit
    def expand_ref(cnt, off):
        Bq = cnt.shape[0]
        prefix = jnp.concatenate(
            [jnp.zeros((Bq, 1), I32), jnp.cumsum(cnt, axis=1, dtype=I32)],
            axis=1,
        )
        n_anchors = jnp.minimum(prefix[:, -1], A)
        slots = jnp.broadcast_to(jnp.arange(A, dtype=I32)[None, :], (Bq, A))
        src = LK._searchsorted_rows(prefix, slots)
        rows = jnp.arange(Bq, dtype=I32)[:, None]
        a_valid = slots < n_anchors[:, None]
        hit_off = slots - prefix[rows, src]
        pos_idx = jnp.where(a_valid, off[rows, src] + hit_off, 0)
        return src, pos_idx, a_valid

    @jax.jit
    def expand_scatter(cnt, off):
        Bq, Mq = cnt.shape
        prefix = jnp.concatenate(
            [jnp.zeros((Bq, 1), I32), jnp.cumsum(cnt, axis=1, dtype=I32)],
            axis=1,
        )
        n_anchors = jnp.minimum(prefix[:, -1], A)
        starts = prefix[:, :-1]  # [B, M] start slot per minimizer
        m_iota = jnp.broadcast_to(jnp.arange(Mq, dtype=I32)[None, :], (Bq, Mq))
        # scatter minimizer index at its start slot (max resolves
        # collisions from zero-count minimizers sharing a slot)
        grid = jnp.full((Bq, A), -1, I32)
        grid = grid.at[
            jnp.arange(Bq, dtype=I32)[:, None], starts
        ].max(jnp.where(cnt > 0, m_iota, -1), mode="drop")
        src = jax.lax.cummax(grid, axis=1)
        src = jnp.maximum(src, 0)
        rows = jnp.arange(Bq, dtype=I32)[:, None]
        slots = jnp.broadcast_to(jnp.arange(A, dtype=I32)[None, :], (Bq, A))
        a_valid = slots < n_anchors[:, None]
        hit_off = slots - prefix[rows, src]
        pos_idx = jnp.where(a_valid, off[rows, src] + hit_off, 0)
        return src, pos_idx, a_valid

    t = bench_call(lambda: expand_ref(cnt_d, off_d))
    print(f"REF expand searchsorted:{t*1e3:6.1f} ms", flush=True)
    t = bench_call(lambda: expand_scatter(cnt_d, off_d))
    print(f"B expand scatter+cummax:{t*1e3:6.1f} ms", flush=True)
    r1 = jax.device_get(expand_ref(cnt_d, off_d))
    r2 = jax.device_get(expand_scatter(cnt_d, off_d))
    okb = all(
        np.array_equal(np.where(r1[2], x, 0), np.where(r2[2], y, 0))
        for x, y in zip(r1[:2], r2[:2])
    ) and np.array_equal(r1[2], r2[2])
    print(f"B == REF: {okb}", flush=True)

    # ---- C) pos fetch --------------------------------------------------
    pos_idx_d = jnp.asarray(r1[1])

    @jax.jit
    def pos_ref(pi):
        return dev.pos_rid[pi], dev.pos_ps[pi]

    @jax.jit
    def pos_aos(pi):
        two = pos2_d[pi]  # [B, A, 2]
        return two[..., 0], two[..., 1].view(jnp.uint32)

    t = bench_call(lambda: pos_ref(pos_idx_d))
    print(f"REF pos 2 gathers:      {t*1e3:6.1f} ms", flush=True)
    t = bench_call(lambda: pos_aos(pos_idx_d))
    print(f"C pos AoS gather:       {t*1e3:6.1f} ms", flush=True)
    c1 = jax.device_get(pos_ref(pos_idx_d))
    c2 = jax.device_get(pos_aos(pos_idx_d))
    print(f"C == REF: "
          f"{np.array_equal(c1[0], c2[0]) and np.array_equal(c1[1], c2[1])}",
          flush=True)


if __name__ == "__main__":
    main()
