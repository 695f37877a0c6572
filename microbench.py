#!/usr/bin/env python
"""Microbenchmarks for the tunnel-attached TPU: dispatch latency,
device->host bandwidth, and front_end compute-vs-download split."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), sorted(ts)[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128), jnp.int32)
    f(x).block_until_ready()
    mn, md = timeit(lambda: f(x).block_until_ready())
    print(f"dispatch+tiny roundtrip: min={mn*1e3:.1f}ms med={md*1e3:.1f}ms")

    for kb in (64, 256, 1024, 4096):
        n = kb * 256
        g = jax.jit(lambda: jnp.arange(n, dtype=jnp.int32))
        arr = g()
        arr.block_until_ready()
        mn, md = timeit(lambda: np.asarray(jax.device_get(arr)), 4)
        print(f"download {kb:5d}KB: min={mn*1e3:7.1f}ms med={md*1e3:7.1f}ms"
              f"  -> {kb/1024/md:6.1f} MB/s (med)")

    up = np.zeros((1024, 1024), np.int32)  # 4MB upload
    mn, md = timeit(lambda: jnp.asarray(up).block_until_ready(), 4)
    print(f"upload 4096KB: min={mn*1e3:.1f}ms med={md*1e3:.1f}ms -> "
          f"{4/md:.1f} MB/s (med)")

    # front_end compute only vs compute+download on the bench shapes
    from bench import simulate, GENOME_LEN, READ_LEN, ERROR_RATE
    from mappy_rs_tpu import Aligner
    rng = np.random.default_rng(0)
    genome = "".join(rng.choice(list("ACGT"), size=GENOME_LEN))
    al = Aligner(seq=genome, preset="map-ont")
    reads, _ = simulate(rng, genome, 256, READ_LEN, ERROR_RATE)
    eng = al._engine

    import mappy_rs_tpu.models.pipeline as pl
    orig_ff = pl._front_end
    state = {}

    # run one map_batch to warm everything, capturing fe_args
    real_front_end_full = eng._front_end_full

    def spy(fe_args, A):
        state["fe_args"] = fe_args
        state["A"] = A
        return real_front_end_full(fe_args, A)

    eng._front_end_full = spy
    t0 = time.perf_counter()
    eng.map_batch(reads)
    print(f"warm map_batch(256): {time.perf_counter()-t0:.2f}s")
    eng._front_end_full = real_front_end_full

    fe_args = state["fe_args"]
    stacked, n_dev = pl._front_end(*fe_args)
    stacked.block_until_ready()

    def compute_only():
        s, n = pl._front_end(*fe_args)
        s.block_until_ready()

    mn, md = timeit(compute_only, 5)
    print(f"front_end compute only: min={mn*1e3:.1f}ms med={md*1e3:.1f}ms")

    def with_dl():
        out = real_front_end_full(fe_args, state["A"])

    mn, md = timeit(with_dl, 5)
    print(f"front_end + download:   min={mn*1e3:.1f}ms med={md*1e3:.1f}ms")

    # timed pure host phase: everything after download
    t0 = time.perf_counter()
    eng.map_batch(reads)
    dt = time.perf_counter() - t0
    m = eng.metrics.snapshot()
    print(f"second warm map_batch(256): {dt:.2f}s  metrics={m}")


if __name__ == "__main__":
    main()
