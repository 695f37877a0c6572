#!/usr/bin/env python
"""Raw tunnel link throughput: uplink (device_put of a bench-shaped
query batch) and downlink (device_get of a compact-table-shaped
array), pipelined, solo or N concurrent processes.

Usage: python prof_link.py [nproc]
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def worker() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
    up = np.random.default_rng(0).integers(
        0, 4, (256, 1024), dtype=np.uint8
    )
    dev = jax.devices()[0]
    jax.device_put(up, dev).block_until_ready()
    # uplink: sequential puts of fresh buffers (copies defeat any
    # dedup; each put is one 256KB transfer)
    bufs = [up + np.uint8(i % 3) for i in range(40)]
    t0 = time.time()
    for b in bufs:
        jax.device_put(b, dev).block_until_ready()
    dt = time.time() - t0
    up_mbs = 40 * up.nbytes / dt / 1e6
    # downlink: device array shaped like the compact chain download
    dn = jax.device_put(
        np.zeros((256, 106), np.int32), dev
    )
    jax.block_until_ready(dn)
    np.asarray(dn)
    t0 = time.time()
    for _ in range(40):
        np.asarray(jax.device_get(dn))
    dt = time.time() - t0
    dn_mbs = 40 * 256 * 106 * 4 / dt / 1e6
    print(f"[pid {os.getpid()}] uplink {up_mbs:.1f} MB/s  "
          f"downlink {dn_mbs:.1f} MB/s", flush=True)


def main() -> None:
    nproc = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    if os.environ.get("_LINK_WORKER"):
        worker()
        return
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env={**os.environ, "_LINK_WORKER": "1"},
        )
        for _ in range(nproc)
    ]
    for p in procs:
        p.wait()


if __name__ == "__main__":
    main()
