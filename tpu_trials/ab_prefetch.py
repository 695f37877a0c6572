#!/usr/bin/env python
"""A/B worker drain size (1 vs 2 device chunks per map_fn call) with
the prefetch pipeline in place, same process, same index."""
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
    from mappy_rs_tpu.runtime.batch import WorkerPool

    rng = np.random.default_rng(0)
    genome = bytes(
        np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, GENOME_LEN)]
    ).decode()
    reads, truth = simulate(rng, genome, N_READS, READ_LEN, ERROR_RATE)
    payload = [{"i": i, "seq": r} for i, r in enumerate(reads)]
    al = Aligner(seq=genome, preset="map-ont")

    def run(drain):
        al.enable_threading(4)
        al._pool.shutdown()
        al._pool = WorkerPool(4, al._threaded_map, batch_size=drain)
        for _ in al.map_batch(payload[:1024]):
            pass
        rates = []
        for _ in range(2):
            t0 = time.time()
            n_ok = 0
            for m, d in al.map_batch(payload):
                if m and abs(m[0].target_start - truth[d["i"]]) < 100:
                    n_ok += 1
            dt = time.time() - t0
            rates.append(N_READS / dt)
        print(f"drain={drain}: " + ", ".join(f"{r:.0f}" for r in rates)
              + f" r/s ({n_ok}/{N_READS} ok)", flush=True)

    for drain in (256, 512, 256, 512):
        run(drain)


if __name__ == "__main__":
    main()
