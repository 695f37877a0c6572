#!/usr/bin/env python
"""Interleaved classic-vs-device_owner topology sweep on the real
chip: configs measured round-robin so shared-backend drift cancels.

classic      — N children, each with its own TPU client (round-4 prod)
device_owner — parent owns the only TPU client; N jax-free post-chain
               children; proxies run the parent-side front end

Usage: PYTHONHASHSEED=0 python tpu_trials/sweep_topology.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

CONFIGS = [
    # (name, topology, procs, proxies, chunk, B)
    ("classic_p7", "classic", 7, 14, 1024, 256),  # round-4 production
    ("devown_p3x6", "device_owner", 3, 6, 1024, 256),
    ("devown_p3x9", "device_owner", 3, 9, 1024, 256),
    ("devown_p4x8", "device_owner", 4, 8, 1024, 256),
    ("devown_p3x6_B512", "device_owner", 3, 6, 1024, 512),
]
CYCLES = 2
N_READS = 8000


def main():
    import faulthandler

    faulthandler.dump_traceback_later(600, repeat=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import ERROR_RATE, GENOME_LEN, READ_LEN, simulate
    from mappy_rs_tpu import Aligner

    rng = np.random.default_rng(0)
    genome = bytes(
        np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, GENOME_LEN)]
    ).decode()
    reads, truth = simulate(rng, genome, 3 * N_READS, READ_LEN, ERROR_RATE)
    payloads = [
        [{"i": i, "seq": r}
         for i, r in enumerate(reads[p * N_READS:(p + 1) * N_READS],
                               start=p * N_READS)]
        for p in range(3)
    ]
    al = Aligner(seq=genome, preset="map-ont")
    results = {name: [] for name, *_ in CONFIGS}
    for cyc in range(CYCLES):
        for name, topo, procs, prox, chunk, bsz in CONFIGS:
            al.enable_threading(0)
            al._config.topology = topo
            al._config.worker_processes = procs
            al._config.proc_chunk = chunk
            al._config.device_batch_size = bsz
            t0 = time.time()
            al.enable_threading(prox)
            al.warmup([p["seq"] for p in payloads[0][:256]])
            spawn_s = time.time() - t0
            for pi in (cyc % 3, (cyc + 1) % 3):
                t0 = time.time()
                n_ok = 0
                for m, d in al.map_batch(payloads[pi]):
                    if m and abs(m[0].target_start - truth[d["i"]]) < 100:
                        n_ok += 1
                dt = time.time() - t0
                results[name].append(N_READS / dt)
                print(f"[cyc{cyc}] {name}: {N_READS / dt:8.1f} r/s "
                      f"({n_ok}/{N_READS} ok, spawn+warm {spawn_s:.0f}s)",
                      flush=True)
    print(f"\n=== summary (max | median over {2 * CYCLES} passes) ===",
          flush=True)
    for name, vals in results.items():
        v = sorted(vals)
        print(f"{name:18s} max {v[-1]:8.1f}  med {v[len(v) // 2]:8.1f}  "
              f"all {[round(x) for x in vals]}", flush=True)


if __name__ == "__main__":
    main()
