"""Sweep worker_processes (oversubscription) x device_batch_size on
the 32Mbp bench workload.  4 physical cores; >4 children oversubscribe
the host but can fill chip bubbles while siblings are in their host
phase.  Usage: python sweep_procs.py "5:256,6:256,4:384"
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

    # procs:B[:proc_chunk[:threads]]
    configs = []
    for c in (sys.argv[1] if len(sys.argv) > 1 else "5:256,6:256").split(","):
        f = [int(x) for x in c.split(":")]
        f += [512, 0][len(f) - 2:]  # defaults for missing chunk/threads
        configs.append(f)
    rng = np.random.default_rng(0)
    genome = bytes(
        np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, GENOME_LEN)]
    ).decode()
    reads, truth = simulate(rng, genome, 3 * N_READS, READ_LEN, ERROR_RATE)
    payloads = [
        [{"i": p * N_READS + i, "seq": r}
         for i, r in enumerate(reads[p * N_READS:(p + 1) * N_READS])]
        for p in range(3)
    ]

    for procs, dbs, chunk, threads in configs:
        t0 = time.time()
        al = Aligner(seq=genome, preset="map-ont")
        al._config.worker_processes = procs
        al._config.device_batch_size = dbs
        al._config.proc_chunk = chunk
        al.enable_threading(threads or procs)
        al.warmup(reads[:256])
        warm = time.time() - t0
        best = 0.0
        for payload in payloads:
            n_ok = 0
            t0 = time.time()
            for m, d in al.map_batch(payload):
                if m and abs(m[0].target_start - truth[d["i"]]) < 100:
                    n_ok += 1
            best = max(best, N_READS / (time.time() - t0))
        print(f"procs={procs} B={dbs} chunk={chunk} t={threads or procs}: "
              f"{best:.0f} r/s ({n_ok}/{N_READS} ok, warm {warm:.0f}s)",
              flush=True)
        al.enable_threading(0)
        al = None
        time.sleep(3)


if __name__ == "__main__":
    main()
