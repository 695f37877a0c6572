#!/usr/bin/env python
"""cProfile the HOST side of the TPU map path (single-threaded direct
map_batch: device front end + host extension + finalize).  The worker
pool hides device latency but not GIL-held python time — this harness
exposes the python-per-read cost that caps threaded throughput.
"""
import cProfile
import pstats
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

    n_reads = 2048
    rng = np.random.default_rng(0)
    genome = bytes(
        np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, GENOME_LEN)]
    ).decode()
    reads, truth = simulate(rng, genome, n_reads, READ_LEN, ERROR_RATE)
    t0 = time.time()
    al = Aligner(seq=genome, preset="map-ont")
    print(f"build: {time.time()-t0:.1f}s", flush=True)
    eng = al._engine

    # warm
    t0 = time.time()
    eng.map_batch(reads[:512], cs=True, md=False)
    print(f"warm: {time.time()-t0:.1f}s", flush=True)

    prof = cProfile.Profile()
    t0 = time.time()
    prof.enable()
    res = eng.map_batch(reads, cs=True, md=False)
    prof.disable()
    dt = time.time() - t0
    n_ok = sum(
        1 for i, rr in enumerate(res)
        if rr and abs(rr[0].rs - truth[i]) < 100
    )
    print(f"direct map_batch: {n_reads/dt:.0f} r/s ({n_ok}/{n_reads} ok)",
          flush=True)
    st = pstats.Stats(prof)
    st.sort_stats("cumulative").print_stats(40)
    st.sort_stats("tottime").print_stats(30)


if __name__ == "__main__":
    main()
