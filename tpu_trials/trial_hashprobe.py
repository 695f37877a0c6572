#!/usr/bin/env python
"""Measure candidate gather shapes for hash-probe seed lookup.

Question (ROUND3 item 2 / VERDICT r4 #2): the binary-search lookup
costs ~15 ms/batch because it is a chain of ~10 dependent gather ops
at 0.4-2.2 ms each.  An open-addressing hash table replaces the chain
with ONE row-pair gather + a value fetch — but only if gathering
[B,M,2,128] rows from a [T/128,128] table is not proportionally more
expensive than a [B,M] element gather.  This measures exactly that.
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np


def bench_call(fn, nit=20):
    import jax

    t0 = time.time()
    jax.block_until_ready(fn())
    tc = time.time() - t0
    t0 = time.time()
    outs = [fn() for _ in range(nit)]
    jax.block_until_ready(outs)
    return (time.time() - t0) / nit, tc


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    _I32, _U32 = jnp.int32, jnp.uint32
    B, M = 256, 204
    TBITS = 24            # 16M slots ~ 32Mbp index at load ~0.37
    T = 1 << TBITS
    N_KEYS = 5_900_000
    rng = np.random.default_rng(0)

    # warm the backend (absorbs any remote-compile cold start)
    x = jnp.ones((128, 128), jnp.float32)
    jax.block_until_ready(jnp.dot(x, x))

    tbl = jnp.asarray(rng.integers(0, 2**31, T, dtype=np.int64).astype(np.int32))
    tbl2d = tbl.reshape(T // 128, 128)
    tbl_inter = jnp.concatenate([tbl2d, tbl2d + 1], axis=1)  # [T/128, 256]
    offcnt = jnp.asarray(
        rng.integers(0, 2**31, (N_KEYS, 2), dtype=np.int64).astype(np.int32)
    )
    q = jnp.asarray(rng.integers(0, 2**32, (B, M), dtype=np.uint64).astype(np.uint32))

    C = np.uint32(0x9E3779B1)

    @jax.jit
    def elem(q):  # one element gather [B,M]
        idx = ((q * C) >> _U32(32 - TBITS)).astype(_I32)
        return tbl[idx]

    @jax.jit
    def elem5(q):  # five dependent element gathers (binary-search-like)
        idx = ((q * C) >> _U32(32 - TBITS)).astype(_I32)
        v = tbl[idx]
        for _ in range(4):
            idx = (idx + v) & (T - 1)
            v = tbl[idx]
        return v

    @jax.jit
    def pair(q):  # [B,M,2] consecutive-pair gather (bs2 style)
        idx = ((q * C) >> _U32(32 - TBITS)).astype(_I32)
        return tbl[idx[:, :, None] + jnp.arange(2, dtype=_I32)]

    @jax.jit
    def rowpair(q):  # [B,M,2,128] row-pair gather + lane reduce
        h = ((q * C) >> _U32(32 - TBITS)).astype(_I32)
        rows = h >> 7
        win = tbl2d[rows[:, :, None] + jnp.arange(2, dtype=_I32)]
        # reduce like the probe would: match q (as i32) and pick slot
        m = win == q.astype(_I32)[:, :, None, None]
        lane = jnp.argmax(m.reshape(B, M, 256), axis=-1)
        return lane.astype(_I32)

    @jax.jit
    def rowpair_inter(q):  # [B,M,2,256] interleaved key+val rows
        h = ((q * C) >> _U32(32 - TBITS)).astype(_I32)
        rows = h >> 7
        win = tbl_inter[rows[:, :, None] + jnp.arange(2, dtype=_I32)]
        keys = win[..., :128].reshape(B, M, 256)
        vals = win[..., 128:].reshape(B, M, 256)
        m = keys == q.astype(_I32)[:, :, None]
        val = jnp.max(jnp.where(m, vals, -1), axis=-1)
        return val

    @jax.jit
    def probe_full(q):  # the real candidate: rows + val fetch + offcnt
        h = ((q * C) >> _U32(32 - TBITS)).astype(_I32)
        rows = h >> 7
        win = tbl2d[rows[:, :, None] + jnp.arange(2, dtype=_I32)]
        keys = win.reshape(B, M, 256)
        m = keys == q.astype(_I32)[:, :, None]
        lane = jnp.argmax(m, axis=-1).astype(_I32)
        found = jnp.any(m, axis=-1)
        slot = (rows << 7) + lane
        idx = tbl[slot]  # value table stand-in
        idx_c = jnp.minimum(jnp.abs(idx) % N_KEYS, N_KEYS - 1)
        oc = offcnt[idx_c]  # [B,M,2] fused offsets+counts
        return found, oc[..., 0], oc[..., 1]

    print(f"B={B} M={M} T=2^{TBITS} ({4 * T / 1e6:.0f}MB table)", flush=True)
    for name, fn in [
        ("elem [B,M]", elem),
        ("elem x5 dependent", elem5),
        ("pair [B,M,2]", pair),
        ("rowpair [B,M,2,128]", rowpair),
        ("rowpair interleaved [B,M,2,256]", rowpair_inter),
        ("probe_full (rows+val+offcnt)", probe_full),
    ]:
        dt, tc = bench_call(lambda fn=fn: fn(q))
        print(f"{name:34s}: {dt * 1e3:7.3f} ms  (first call {tc:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
