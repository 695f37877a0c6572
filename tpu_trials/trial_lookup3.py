#!/usr/bin/env python
"""Trial 3: slice-per-query window search (vmap'd dynamic_slice ->
XLA gather with slice_sizes=(W,4)) vs enumerated-index gather, plus a
key-window-only variant with follow-up meta gathers.
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
    batch = np.full((B, L), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    for bi in range(B):
        c = codes[bi % len(codes)]
        batch[bi, : len(c)] = c
        lens[bi] = len(c)
    cb, lb = jnp.asarray(batch), jnp.asarray(lens)
    I32, U32 = jnp.int32, jnp.uint32

    mins_j = jax.tree.map(jnp.asarray, jax.jit(
        partial(sketch_compact, k=k, w=w, max_minimizers=M)
    )(cb, lb))
    jax.block_until_ready(mins_j)

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
    W = max(8, 1 << (mx - 1).bit_length())
    print(f"n={n} bb={bb} max_bucket={mx} W={W}", flush=True)
    bstart = np.concatenate([[0], np.cumsum(bcnt)]).astype(np.int32)
    n_pad = ((n + W + 127) // 128) * 128
    meta = np.zeros((n_pad, 4), np.int32)
    meta[:, 0] = -1
    meta[:n, 0] = (
        idx.keys & np.uint64(0xFFFFFFFF)
    ).astype(np.uint32).view(np.int32)
    meta[:n, 1] = idx.key_offsets[:n].astype(np.int32)
    meta[:n, 2] = (
        idx.key_offsets[1:] - idx.key_offsets[:-1]
    ).astype(np.int32)
    keys_only = np.full(n_pad, -1, np.int32)
    keys_only[:n] = meta[:n, 0]
    offs_np = np.zeros(n_pad, np.int32)
    offs_np[:n] = meta[:n, 1]
    cnts_np = np.zeros(n_pad, np.int32)
    cnts_np[:n] = meta[:n, 2]
    meta_d = jnp.asarray(meta)
    keys_d = jnp.asarray(keys_only)
    offs_d = jnp.asarray(offs_np)
    cnts_d = jnp.asarray(cnts_np)
    bstart_d = jnp.asarray(bstart)
    mid_occ = int(eng.opt.mid_occ)

    # ---- D) slice-per-query AoS window --------------------------------
    @partial(jax.jit, static_argnames=("bb", "shift", "W"))
    def search_slice(mins, bb, shift, W):
        q_lo = mins["key_lo"]
        Bq, Mq = q_lo.shape
        b = jnp.minimum(q_lo >> U32(shift), U32((1 << bb) - 1)).astype(I32)
        start = bstart_d[b]
        width = bstart_d[b + 1] - start

        def one(s):
            return jax.lax.dynamic_slice(meta_d, (s, 0), (W, 4))

        win = jax.vmap(jax.vmap(one))(start)  # [B, M, W, 4]
        qk = q_lo.astype(jnp.uint32).view(jnp.int32)
        hit = (win[..., 0] == qk[:, :, None]) & (
            jnp.arange(W, dtype=I32)[None, None, :] < width[:, :, None]
        )
        found = hit.any(axis=2) & (mins["pos"] >= 0)
        off = jnp.max(jnp.where(hit, win[..., 1], 0), axis=2)
        cnt0 = jnp.max(jnp.where(hit, win[..., 2], 0), axis=2)
        cnt = jnp.where(found & (cnt0 <= mid_occ), cnt0, 0)
        return cnt, off, found

    t = bench_call(lambda: search_slice(mins_j, bb, shift, W))
    print(f"D slice window search:  {t*1e3:6.1f} ms", flush=True)

    # ---- E) key-only window, then matched meta gathers ------------------
    @partial(jax.jit, static_argnames=("bb", "shift", "W"))
    def search_keywin(mins, bb, shift, W):
        q_lo = mins["key_lo"]
        b = jnp.minimum(q_lo >> U32(shift), U32((1 << bb) - 1)).astype(I32)
        start = bstart_d[b]
        width = bstart_d[b + 1] - start

        def one(s):
            return jax.lax.dynamic_slice(keys_d, (s,), (W,))

        win = jax.vmap(jax.vmap(one))(start)  # [B, M, W]
        qk = q_lo.astype(jnp.uint32).view(jnp.int32)
        lanes = jnp.arange(W, dtype=I32)[None, None, :]
        hit = (win == qk[:, :, None]) & (lanes < width[:, :, None])
        found = hit.any(axis=2) & (mins["pos"] >= 0)
        pos_in = jnp.max(jnp.where(hit, lanes, 0), axis=2)
        ix = start + pos_in
        off = offs_d[ix]
        cnt0 = cnts_d[ix]
        cnt = jnp.where(found & (cnt0 <= mid_occ), cnt0, 0)
        return cnt, jnp.where(found, off, 0), found

    t = bench_call(lambda: search_keywin(mins_j, bb, shift, W))
    print(f"E key-window search:    {t*1e3:6.1f} ms", flush=True)

    d = jax.device_get(search_slice(mins_j, bb, shift, W))
    e = jax.device_get(search_keywin(mins_j, bb, shift, W))
    okde = np.array_equal(d[0], e[0]) and np.array_equal(
        np.where(d[0] > 0, d[1], 0), np.where(e[0] > 0, e[1], 0)
    )
    print(f"D == E: {okde}", flush=True)


if __name__ == "__main__":
    main()
