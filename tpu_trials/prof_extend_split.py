#!/usr/bin/env python
"""Split extend_jobs_batch cost: C++ lib call vs python marshalling
(concat staging, output alloc, per-job result slicing).  Feeds the
REAL production job mix by running the standard bench workload through
map_batch with the lib call wrapped in a timer."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import simulate, GENOME_LEN, READ_LEN, ERROR_RATE
    from mappy_rs_tpu import Aligner
    from mappy_rs_tpu import native

    n_reads = 2048
    rng = np.random.default_rng(0)
    genome = bytes(
        np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, GENOME_LEN)]
    ).decode()
    reads, truth = simulate(rng, genome, n_reads, READ_LEN, ERROR_RATE)
    al = Aligner(seq=genome, preset="map-ont")
    eng = al._engine

    lib = native._load()
    stats = {"lib_s": 0.0, "calls": 0, "jobs": 0, "qsum": 0, "tsum": 0}
    real = lib.extend_jobs_batch

    def timed(*a):
        t0 = time.perf_counter()
        r = real(*a)
        stats["lib_s"] += time.perf_counter() - t0
        stats["calls"] += 1
        stats["jobs"] += a[8]
        return r

    lib.extend_jobs_batch = timed

    eng.map_batch(reads[:512])  # warm
    stats.update(lib_s=0.0, calls=0, jobs=0)
    t0 = time.perf_counter()
    res = eng.map_batch(reads)
    dt = time.perf_counter() - t0
    ok = sum(1 for i, rr in enumerate(res)
             if rr and abs(rr[0].rs - truth[i]) < 100)
    m = eng.metrics.snapshot()
    ext_wall = m.get("time_extend_s", 0) + m.get("time_extend_small_s", 0)
    print(f"{n_reads} reads {dt:.2f}s ({ok}/{n_reads} ok)")
    print(f"extend stage wall: {ext_wall:.3f}s "
          f"({1e3 * ext_wall / n_reads:.3f} ms/read)")
    print(f"  lib.extend_jobs_batch: {stats['lib_s']:.3f}s over "
          f"{stats['calls']} calls, {stats['jobs']} jobs "
          f"({1e3 * stats['lib_s'] / n_reads:.3f} ms/read C++)")
    print(f"  python marshalling: {ext_wall - stats['lib_s']:.3f}s "
          f"({1e3 * (ext_wall - stats['lib_s']) / n_reads:.3f} ms/read)")
    print(f"dp_cells {m.get('dp_cells', 0):.3e} -> "
          f"{m.get('dp_cells', 0) / max(stats['lib_s'], 1e-9):.3e} cells/s "
          f"in-lib")


if __name__ == "__main__":
    main()
