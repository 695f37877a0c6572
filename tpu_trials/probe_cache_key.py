#!/usr/bin/env python
"""Probe persistent-compile-cache key stability of the child graph.

Builds the bench index, maps one 256-read chunk through a child-like
engine (single_batch_shape) and reports how long the first map took
plus whether a new jit__front_end_bt cache entry appeared — run twice
under the same PYTHONHASHSEED to test key stability across processes.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import glob

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import simulate, GENOME_LEN, READ_LEN, ERROR_RATE
    from mappy_rs_tpu import Aligner

    before = set(glob.glob("/root/.cache/jaxcache/jit__front_end_bt*"))
    rng = np.random.default_rng(0)
    genome = bytes(
        np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, GENOME_LEN)]
    ).decode()
    reads, _ = simulate(rng, genome, 256, READ_LEN, ERROR_RATE)
    al = Aligner(seq=genome, preset="map-ont")
    al._engine.cfg.single_batch_shape = True
    t0 = time.time()
    al._engine.map_batch(reads)
    dt = time.time() - t0
    after = set(glob.glob("/root/.cache/jaxcache/jit__front_end_bt*"))
    print(f"PYTHONHASHSEED={os.environ.get('PYTHONHASHSEED', '<unset>')} "
          f"first chunk: {dt:.1f}s, new cache entries: {len(after - before)}",
          flush=True)


if __name__ == "__main__":
    main()
