#!/usr/bin/env python
"""Real-TPU trial of the fused extension+traceback path: correctness
vs the host engine + timing at bench shapes."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("backend:", jax.default_backend())

    from mappy_rs_tpu.ops.extend import ExtendParams
    from mappy_rs_tpu.ops.extend_pallas import extend_traceback_device
    from mappy_rs_tpu import native

    PARAMS = ExtendParams(a=2, b=4, q=4, e=2, q2=24, e2=1, sc_ambi=1)
    rng = np.random.default_rng(5)

    # bench-like mid group: J=512 jobs of ~512x512, W=128
    J, QMAX, TMAX, W = 256, 512, 512, 128
    q = np.full((J, QMAX), 4, np.uint8)
    t = np.full((J, TMAX), 4, np.uint8)
    ql = np.zeros(J, np.int32)
    tl = np.zeros(J, np.int32)
    for ji in range(J):
        tseq = rng.integers(0, 4, rng.integers(400, TMAX)).astype(np.uint8)
        # ~6% errors
        qseq = []
        i = 0
        while i < len(tseq):
            r = rng.random()
            if r < 0.04:
                qseq.append((tseq[i] + 1) % 4)
                i += 1
            elif r < 0.05:
                qseq.append(tseq[i])
                qseq.append(rng.integers(0, 4))
                i += 1
            elif r < 0.06:
                i += 2
            else:
                qseq.append(tseq[i])
                i += 1
        qseq = np.asarray(qseq[:QMAX], np.uint8)
        q[ji, : len(qseq)] = qseq
        t[ji, : len(tseq)] = tseq
        ql[ji] = len(qseq)
        tl[ji] = len(tseq)
    mode = np.zeros(J, np.int32)  # global mids

    t0 = time.perf_counter()
    res = extend_traceback_device(q, t, ql, tl, mode, W, PARAMS, 10, 128)
    print(f"first call (compile): {time.perf_counter()-t0:.1f}s")
    for trial in range(3):
        t0 = time.perf_counter()
        res = extend_traceback_device(q, t, ql, tl, mode, W, PARAMS, 10, 128)
        dt = time.perf_counter() - t0
        cells = J * (QMAX + TMAX - 1) * W
        print(f"warm fused call: {dt*1e3:.1f}ms  ({cells/dt/1e9:.1f} G dp_cells/s)")

    # correctness vs host engine
    host = native.extend_banded_batch(q, t, ql, tl, W, PARAMS, 10, 0, 0)
    info = res["info"]
    n_diff = 0
    for ji in range(J):
        ops_h, sc_h, qc_h, tc_h, _z = host[ji]
        row = info[ji]
        if int(row[5]):
            print(f"job {ji}: OVERFLOW")
            n_diff += 1
            continue
        parts = []
        if int(row[2]) >= 0:
            parts.append((int(row[2]) + 1, 2))
        if int(row[1]) >= 0:
            parts.append((int(row[1]) + 1, 1))
        raw = res["ops"][ji, : int(row[0])][::-1]
        parts.extend((int(v) >> 4, int(v) & 0xF) for v in raw)
        from mappy_rs_tpu.ops import cigar as cig
        got = cig.merge_cigars([parts])
        if got != ops_h or int(row[3]) != sc_h:
            n_diff += 1
            if n_diff < 4:
                print(f"job {ji} DIFF: sc {int(row[3])} vs {sc_h}; "
                      f"ops {got[:5]} vs {ops_h[:5]}")
    print(f"correctness vs host engine: {J-n_diff}/{J} identical")


if __name__ == "__main__":
    main()
