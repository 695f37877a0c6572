#!/usr/bin/env python
"""Device batch-size sweep: does B=512/1024 amortize the ~2.5 ms/batch
dispatch bubble (trace: 7.8 ms busy vs 10.3 ms pipelined at B=256)?
Reports solo single-process throughput + pipelined/blocking ms/batch.

Run: MAPPY_RS_TPU_BATCH=512 PYTHONHASHSEED=0 python tpu_trials/prof_bsweep.py
"""
import os
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

    n_reads = 4096
    rng = np.random.default_rng(0)
    genome = bytes(
        np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, GENOME_LEN)]
    ).decode()
    reads, truth = simulate(rng, genome, 2 * n_reads, READ_LEN, ERROR_RATE)
    al = Aligner(seq=genome, preset="map-ont")
    eng = al._engine
    B = eng.cfg.device_batch_size
    print(f"B={B} depth={eng.cfg.pipeline_depth}", flush=True)

    t0 = time.time()
    eng.map_batch(reads[:B], cs=True, md=False)
    print(f"warm (incl. compile): {time.time()-t0:.1f}s", flush=True)

    for p in range(2):
        chunk = reads[p * n_reads:(p + 1) * n_reads]
        t0 = time.time()
        res = eng.map_batch(chunk, cs=True, md=False)
        dt = time.time() - t0
        n_ok = sum(
            1 for i, rr in enumerate(res)
            if rr and abs(rr[0].rs - truth[p * n_reads + i]) < 100
        )
        print(f"pass {p}: {n_reads/dt:.0f} r/s solo ({n_ok}/{n_reads} ok)",
              flush=True)
    probe = eng.probe_front_end(10)
    if probe:
        print(f"probe: pipelined {1e3*probe[0]:.2f} ms/batch "
              f"({1e3*probe[0]/B*1e3:.1f} us/read), blocking "
              f"{1e3*probe[-1]:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
