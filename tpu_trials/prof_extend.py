#!/usr/bin/env python
"""Measure the device extension kernels (DP-only and fused
DP+traceback) pipelined, at the production job shapes."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def bench_call(fn, nit=10):
    import jax

    jax.block_until_ready(fn())
    t0 = time.time()
    outs = [fn() for _ in range(nit)]
    jax.block_until_ready(outs)
    return (time.time() - t0) / nit


def main():
    import jax

    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mappy_rs_tpu.ops.extend import ExtendParams
    from mappy_rs_tpu.ops.extend_pallas import (
        extend_dp_pallas, extend_traceback_device,
    )

    P = ExtendParams(a=2, b=4, q=4, e=2, q2=24, e2=1, sc_ambi=1)
    rng = np.random.default_rng(7)
    # production mid-segment shape: SEG_LEN=384 query, target ~512, W=128
    for (J, QMAX, TMAX, W) in (
        (256, 512, 512, 128),
        (512, 512, 512, 128),
        (256, 512, 1024, 128),
    ):
        q = np.full((J, QMAX), 4, np.uint8)
        t = np.full((J, TMAX), 4, np.uint8)
        ql = np.zeros(J, np.int32)
        tl = np.zeros(J, np.int32)
        for i in range(J):
            n = int(rng.integers(300, min(QMAX, 420)))
            a = rng.integers(0, 4, n).astype(np.uint8)
            b = a.copy()
            idx = rng.integers(0, n, n // 12)
            b[idx] = (b[idx] + 1) % 4
            q[i, :n] = a
            t[i, : len(b)] = b
            ql[i], tl[i] = n, len(b)
        mode = np.zeros(J, np.int32)
        try:
            tm = bench_call(lambda: extend_dp_pallas(q, t, ql, tl, W, P))
            cells = float(J) * (QMAX + TMAX - 1) * W
            print(f"extend_dp_pallas J={J} {QMAX}x{TMAX} W={W}: "
                  f"{tm*1e3:.2f} ms ({cells/tm/1e9:.1f} Gcells/s, "
                  f"{tm/J*1e6:.0f} us/job)", flush=True)
        except Exception as e:
            print(f"extend_dp_pallas J={J} fail:", repr(e)[:200], flush=True)
        try:
            tm = bench_call(lambda: extend_traceback_device(
                q, t, ql, tl, mode, W, P, 0, max_ops=128))
            print(f"extend_traceback_device J={J} {QMAX}x{TMAX} W={W}: "
                  f"{tm*1e3:.2f} ms ({tm/J*1e6:.0f} us/job)", flush=True)
        except Exception as e:
            print(f"extend_traceback_device J={J} fail:",
                  repr(e)[:300], flush=True)


if __name__ == "__main__":
    main()
