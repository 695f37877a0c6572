#!/usr/bin/env python
"""Time the device-index upload per array, plus a monolithic packed
upload, to find why a child's one-time warmup costs ~45-60s+."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
    from bench import GENOME_LEN
    from mappy_rs_tpu import Aligner

    rng = np.random.default_rng(0)
    genome = bytes(
        np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, GENOME_LEN)]
    ).decode()
    t0 = time.time()
    al = Aligner(seq=genome, preset="map-ont")
    idx = al._engine.index
    print(f"index build {time.time() - t0:.1f}s", flush=True)

    # warm the client
    jax.block_until_ready(jnp.ones((8, 128)) + 1)

    t0 = time.time()
    dev = idx.device  # triggers _build_device: host prep + uploads
    names = ["offcnt", "pos_rp", "hash_rows", "hash_val"]
    for nm in names:
        a = getattr(dev, nm)
        if a is not None:
            jax.block_until_ready(a)
    t_all = time.time() - t0
    tot = 0
    for nm in names:
        a = getattr(dev, nm)
        if a is None:
            continue
        mb = a.size * 4 / 1e6
        tot += mb
        t0 = time.time()
        host = np.asarray(a)  # D2H
        d2h = time.time() - t0
        t0 = time.time()
        d = jnp.asarray(host)  # H2D again, isolated
        jax.block_until_ready(d)
        h2d = time.time() - t0
        print(f"{nm:10s} {mb:7.1f}MB  H2D {h2d:6.2f}s "
              f"({mb / max(h2d, 1e-9):6.0f}MB/s)  D2H {d2h:6.2f}s",
              flush=True)
    print(f"build+upload total: {t_all:.1f}s for {tot:.0f}MB", flush=True)

    # monolithic: all arrays packed into one i32 buffer, one put
    bufs = [np.asarray(getattr(dev, nm)).view(np.int32).ravel()
            for nm in names]
    one = np.concatenate(bufs)
    t0 = time.time()
    d = jnp.asarray(one)
    jax.block_until_ready(d)
    t_one = time.time() - t0
    print(f"monolithic {one.size * 4 / 1e6:.0f}MB in {t_one:.2f}s "
          f"({one.size * 4 / 1e6 / t_one:.0f}MB/s)", flush=True)


if __name__ == "__main__":
    main()
