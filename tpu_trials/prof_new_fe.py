#!/usr/bin/env python
"""Measure the production device front end after the round-4 redesign
(hash-probe lookup, single-word sketch, packed meta/pos gathers).
Prints steady-state pipelined ms/batch + blocking RTT via
probe_front_end on the 32 Mbp bench index."""
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

    rng = np.random.default_rng(0)
    genome = bytes(
        np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, GENOME_LEN)]
    ).decode()
    reads, truth = simulate(rng, genome, 600, READ_LEN, ERROR_RATE)
    t0 = time.time()
    al = Aligner(seq=genome, preset="map-ont")
    print(f"index build {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    out = [al.map(r) for r in reads[:2]]
    print(f"first map (compile) {time.time() - t0:.1f}s", flush=True)
    ok = 0
    t0 = time.time()
    res = al._engine.map_batch(reads)
    dt = time.time() - t0
    for i, regs in enumerate(res):
        if regs and abs(regs[0].rs - truth[i]) < 100:
            ok += 1
    print(f"map_batch 600 reads: {dt:.2f}s ({600 / dt:.0f} r/s 1-proc), "
          f"accuracy {ok}/600", flush=True)
    probe = al.probe_front_end(10)
    print(f"probe_front_end: pipelined {1e3 * probe[0]:.2f} ms/batch, "
          f"blocking {1e3 * probe[-1]:.2f} ms", flush=True)
    m = al.metrics
    print({k: round(v, 3) for k, v in m.items() if "time" in k or "fe" in k},
          flush=True)


if __name__ == "__main__":
    main()
