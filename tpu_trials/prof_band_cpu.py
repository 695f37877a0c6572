#!/usr/bin/env python
"""Host banded-DP microbench at the production job mix (mid segments
W=32 + flanks), Gcells/s in-lib.  CPU-only — safe to run anywhere."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

def main():
    from mappy_rs_tpu import native
    from mappy_rs_tpu.ops.extend import ExtendParams
    assert native.available()
    P = ExtendParams(a=2, b=4, q=4, e=2, q2=24, e2=1, sc_ambi=1)
    rng = np.random.default_rng(7)
    # production mix per read (~1kb, 5% err): ~6 mid segments
    # (ql~tl~120-400, W=32, mode 2) + 2 flanks (ql~40-120, W~256ish, mode 1)
    q_list, t_list, Wv, modev = [], [], [], []
    for _ in range(2000):
        n = int(rng.integers(120, 400))
        a = rng.integers(0, 4, n).astype(np.uint8)
        b = a.copy()
        idx = rng.integers(0, n, max(1, n // 20))
        b[idx] = (b[idx] + 1) % 4
        q_list.append(a); t_list.append(b)
        Wv.append(32); modev.append(2)
    for _ in range(400):
        n = int(rng.integers(30, 120))
        a = rng.integers(0, 4, n).astype(np.uint8)
        b = a.copy()
        idx = rng.integers(0, n, max(1, n // 20))
        b[idx] = (b[idx] + 1) % 4
        q_list.append(a); t_list.append(b[: int(n * 0.9)])
        Wv.append(256); modev.append(1)
    Wv = np.asarray(Wv, np.int32); modev = np.asarray(modev, np.int32)
    cells = sum((len(q) + len(t) - 1) * w
                for q, t, w in zip(q_list, t_list, Wv))
    # warm
    native.extend_jobs_batch(q_list, t_list, Wv, modev, P, 0, zdrop=400)
    t0 = time.perf_counter(); nit = 5
    for _ in range(nit):
        res = native.extend_jobs_batch(q_list, t_list, Wv, modev, P, 0,
                                       zdrop=400)
    dt = (time.perf_counter() - t0) / nit
    print(f"jobs={len(q_list)} cells={cells/1e6:.1f}M  {dt*1e3:.1f} ms  "
          f"{cells/dt/1e9:.2f} Gcells/s")
    # checksum for parity across kernel changes
    chk = 0
    for ops, sc, qc, tc, zd in res:
        chk = (chk * 1000003 + int(sc) + int(qc) * 7 + int(tc) * 13
               + int(zd) + int(np.bitwise_xor.reduce(ops)) if len(ops) else chk*31+int(sc)) % (1 << 61)
    print("checksum", chk)

if __name__ == "__main__":
    main()
