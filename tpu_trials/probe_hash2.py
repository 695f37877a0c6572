#!/usr/bin/env python
"""Real-chip ms/batch probe for the two-word hash front end (k>15
presets, VERDICT r5 #4 'done' criterion: k=19 within ~20% of the
k=15 ms/batch at the same shapes).

Usage: PYTHONHASHSEED=0 python tpu_trials/probe_hash2.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from mappy_rs_tpu import Aligner

    rng = np.random.default_rng(0)
    genome = bytes(
        np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, 32_000_000)]
    ).decode()
    reads = []
    for _ in range(256):
        s = int(rng.integers(0, len(genome) - 1000))
        reads.append(genome[s: s + 1000])
    out = {}
    for preset in ("map-ont", "map-hifi"):
        al = Aligner(seq=genome, preset=preset)
        dev = al._engine.dev
        mode = ("hash2" if getattr(dev, "hash_rows", None) is not None
                and dev.hash_rows.ndim == 3 else
                "hash" if getattr(dev, "hash_rows", None) is not None
                else "bucketed")
        t0 = time.time()
        al._engine.map_batch(reads[:256], cs=True)
        warm = time.time() - t0
        probe = al._engine.probe_front_end(10)
        out[preset] = (mode, probe[0] * 1e3 if probe else None, warm)
        print(f"{preset}: k={al.k} mode={mode} "
              f"ms/batch={out[preset][1]:.2f} (first map {warm:.0f}s)",
              flush=True)
    if out["map-ont"][1] and out["map-hifi"][1]:
        r = out["map-hifi"][1] / out["map-ont"][1]
        print(f"k=19/k=15 ms ratio: {r:.2f} "
              f"({'PASS' if r <= 1.25 else 'over'} vs ~20% target)",
              flush=True)


if __name__ == "__main__":
    main()
