"""Local proc-pool scaling sweep (VERDICT r2 directive 8).

Measures map_batch throughput of the all-native CPU path (the GIL-free
work lives in C++; the per-read glue is Python) as worker_processes
goes 0 (pure threads) -> 1 -> 2 -> 4 on this 4-core host.  The curve
quantifies what the multi-process runtime buys over the thread pool:
threads serialize the Python glue on the GIL; processes scale it.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import simulate, READ_LEN, ERROR_RATE

GENOME_LEN = 32_000_000
N = 2000


def main() -> None:
    from mappy_rs_tpu import Aligner

    rng = np.random.default_rng(0)
    genome = bytes(
        np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, GENOME_LEN)]
    ).decode()
    reads, truth = simulate(rng, genome, 2 * N, READ_LEN, ERROR_RATE)
    payloads = [
        [{"i": p * N + i, "seq": r}
         for i, r in enumerate(reads[p * N:(p + 1) * N])]
        for p in range(2)
    ]
    results = []
    for procs in (0, 1, 2, 4):
        al = Aligner(seq=genome, preset="map-ont")
        al._engine.cfg.front_end_backend = "cpu"
        al._engine.cfg.extension_backend = "host"
        al._engine.cfg.worker_processes = procs
        al.enable_threading(4)
        for _ in al.map_batch(payloads[0][:256]):  # warm children
            pass
        best = 0.0
        for payload in payloads:
            n_ok = 0
            t0 = time.time()
            for m, d in al.map_batch(payload):
                if m and abs(m[0].target_start - truth[d["i"]]) < 100:
                    n_ok += 1
            best = max(best, N / (time.time() - t0))
        al.enable_threading(0)
        al = None
        r = {"worker_processes": procs, "reads_per_s": round(best, 1),
             "ok": n_ok, "n": N}
        results.append(r)
        print(json.dumps(r), flush=True)
    base = results[0]["reads_per_s"]
    for r in results:
        r["vs_threads"] = round(r["reads_per_s"] / base, 2)
    print(json.dumps({"sweep": results}, indent=1))


if __name__ == "__main__":
    main()
