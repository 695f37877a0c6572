#!/usr/bin/env python
"""A/B gather formulations on the 32Mbp index shapes.

a) pair window-gather  bucket_start[b[:,:,None]+arange(2)]  (production)
b) two elementwise     bucket_start[b], bucket_start[b+1]
c) one [2,B,M]         bucket_start[stack([b, b+1])]
d) meta row-gather     meta[rows, src]            [B,A,5] from [B,M,5]
e) meta flat slice     meta.reshape(B*M,5)[rows*M+src]
f) meta per-field flat 5 x flat[B*M][rows*M+src]
g) meta flat elementwise with field-major index  (idx*5+f trick)
h) counts+offsets two elementwise vs packed int64 one gather
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def bench_call(fn, nit=20):
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
    _I32 = jnp.int32
    rng = np.random.default_rng(0)
    B, M, A = 256, 204, 256
    NB = 1 << 23
    NK = 5_853_440
    table = jnp.asarray(rng.integers(0, NK, NB + 1, dtype=np.int32))
    b_np = rng.integers(0, NB - 1, (B, M), dtype=np.int32)
    b = jnp.asarray(b_np)
    meta = jnp.asarray(rng.integers(0, 1 << 20, (B, M, 5), dtype=np.int32))
    src = jnp.asarray(rng.integers(0, M, (B, A), dtype=np.int32))
    rows = jnp.arange(B, dtype=_I32)[:, None]
    counts = jnp.asarray(rng.integers(0, 100, NK, dtype=np.int32))
    offs = jnp.asarray(rng.integers(0, NK, NK, dtype=np.int32))
    co64 = (offs.astype(jnp.int64) << 32) | counts.astype(jnp.int64)
    idx = jnp.asarray(rng.integers(0, NK, (B, M), dtype=np.int32))

    @jax.jit
    def a_pair(b):
        return table[b[:, :, None] + jnp.arange(2, dtype=_I32)]

    @jax.jit
    def b_two(b):
        return table[b], table[b + 1]

    @jax.jit
    def c_stack(b):
        return table[jnp.stack([b, b + 1])]

    @jax.jit
    def d_row(src):
        return meta[rows, src]

    mflat = meta.reshape(B * M, 5)

    @jax.jit
    def e_flat_slice(src):
        return mflat[rows * M + src]

    @jax.jit
    def f_per_field(src):
        fi = rows * M + src
        return [mflat[:, j][fi] for j in range(5)]

    mfield = jnp.asarray(
        np.ascontiguousarray(
            np.asarray(meta).transpose(2, 0, 1).reshape(5, B * M)
        )
    )

    @jax.jit
    def g_field_major(src):
        fi = rows * M + src
        return [mfield[j][fi] for j in range(5)]

    @jax.jit
    def h_two(idx):
        return counts[idx], offs[idx]

    @jax.jit
    def h_packed(idx):
        v = co64[idx]
        return (v & 0xFFFFFFFF).astype(_I32), (v >> 32).astype(_I32)

    for name, fn, arg in (
        ("a pair window-gather ", a_pair, b),
        ("b two elementwise    ", b_two, b),
        ("c one [2,B,M] gather ", c_stack, b),
        ("d meta row-gather    ", d_row, src),
        ("e meta flat slice    ", e_flat_slice, src),
        ("f meta per-field flat", f_per_field, src),
        ("g meta field-major   ", g_field_major, src),
        ("h counts+offs 2x     ", h_two, idx),
        ("h counts+offs int64  ", h_packed, idx),
    ):
        t = bench_call(lambda fn=fn, arg=arg: fn(arg)) * 1e3
        print(f"{name}: {t:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
