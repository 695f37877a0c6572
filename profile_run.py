#!/usr/bin/env python
"""Round-2 profiling harness: where does the wall time go?

Runs the bench workload through AlignmentEngine.map_batch directly
(no worker pool) and prints a per-stage breakdown, then a cProfile
top list of host-side time.
"""
import cProfile
import io
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import simulate, GENOME_LEN, N_READS, READ_LEN, ERROR_RATE
    from mappy_rs_tpu import Aligner

    rng = np.random.default_rng(0)
    genome = "".join(rng.choice(list("ACGT"), size=GENOME_LEN))
    al = Aligner(seq=genome, preset="map-ont")
    reads, truth = simulate(rng, genome, N_READS, READ_LEN, ERROR_RATE)

    import faulthandler
    faulthandler.dump_traceback_later(180, repeat=True, file=sys.stderr)
    eng = al._engine
    B = al._config.device_batch_size
    print(f"device_batch_size={B}", file=sys.stderr)

    # warm-up compile
    t0 = time.perf_counter()
    eng.map_batch(reads[:B])
    print(f"warmup batch: {time.perf_counter()-t0:.2f}s", file=sys.stderr)
    eng.metrics = type(eng.metrics)()

    # timed run, serial batches
    t0 = time.perf_counter()
    pr = cProfile.Profile()
    pr.enable()
    for s in range(0, N_READS, B):
        eng.map_batch(reads[s:s+B], cs=True)
    pr.disable()
    dt = time.perf_counter() - t0
    print(f"serial single-thread: {N_READS/dt:.1f} reads/s ({dt:.2f}s)",
          file=sys.stderr)
    print("metrics:", dict(eng.metrics.counters), file=sys.stderr)

    # threaded pool runs (the production map_batch path)
    payload = [{"i": i, "seq": r} for i, r in enumerate(reads)]
    for nt in (4, 6):
        al.enable_threading(nt)
        for _ in al.map_batch(payload[:256]):
            pass
        t0 = time.perf_counter()
        n = 0
        for _m, _d in al.map_batch(payload):
            n += 1
        dt = time.perf_counter() - t0
        print(f"pool {nt} workers: {n/dt:.1f} reads/s ({dt:.2f}s)",
              file=sys.stderr)
    buf = io.StringIO()
    ps = pstats.Stats(pr, stream=buf).sort_stats("cumulative")
    ps.print_stats(35)
    print(buf.getvalue(), file=sys.stderr)


if __name__ == "__main__":
    main()
