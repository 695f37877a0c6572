#!/usr/bin/env python
"""Sweep (n_workers, device_batch_size) on the 32Mbp bench workload.
One genome/index build, one process; each config re-warms its shapes.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import simulate, GENOME_LEN, N_READS, READ_LEN, ERROR_RATE
    from mappy_rs_tpu import Aligner

    rng = np.random.default_rng(0)
    genome = bytes(
        np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, GENOME_LEN)]
    ).decode()
    reads, truth = simulate(rng, genome, N_READS, READ_LEN, ERROR_RATE)
    payload = [{"i": i, "seq": r} for i, r in enumerate(reads)]
    t0 = time.time()
    al = Aligner(seq=genome, preset="map-ont")
    print(f"build: {time.time()-t0:.1f}s", flush=True)

    for workers, dbs in ((4, 256), (6, 256), (4, 512), (6, 512), (8, 256)):
        al._engine.cfg.device_batch_size = dbs
        al.enable_threading(workers)
        # warm (compiles any new B shapes)
        t0 = time.time()
        for _ in al.map_batch(payload[:1024]):
            pass
        warm = time.time() - t0
        t0 = time.time()
        n_ok = 0
        for m, d in al.map_batch(payload):
            if m and abs(m[0].target_start - truth[d["i"]]) < 100:
                n_ok += 1
        dt = time.time() - t0
        print(f"workers={workers} B={dbs}: {N_READS/dt:.0f} r/s "
              f"({n_ok}/{N_READS} ok, warm {warm:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
