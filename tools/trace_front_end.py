#!/usr/bin/env python
"""Per-kernel device-time profile of the front end from a REAL
jax.profiler trace (VERDICT r4 item 4: corroborate the demand-based
duty estimate with trace data).

Runs N pipelined front-end dispatches inside jax.profiler.start_trace,
then parses the Chrome-trace JSON the PJRT plugin emits (works through
the axon tunnel; no tensorflow needed) and reports:
  - device-busy time per batch (sum of TPU-lane op durations / N)
  - the top device ops by time (kernel-level attribution)
  - device duty over the traced wall (busy / wall)
vs probe_front_end's pipelined ms/batch.

Usage: PYTHONHASHSEED=0 python tools/trace_front_end.py [N_BATCHES]
"""
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_trace(logdir: str):
    runs = sorted(glob.glob(os.path.join(logdir, "plugins/profile/*")))
    path = glob.glob(os.path.join(runs[-1], "*.trace.json.gz"))[0]
    with gzip.open(path) as f:
        t = json.load(f)
    ev = t["traceEvents"]
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"]["name"]
    dev_dur = collections.Counter()
    dev_total = 0.0
    t0, t1 = float("inf"), 0.0
    for e in ev:
        if e.get("ph") != "X":
            continue
        if "TPU" in pids.get(e["pid"], ""):
            d = e.get("dur", 0)
            dev_dur[e["name"]] += d
            # jit_* events are whole-executable ENVELOPES whose
            # duration equals the sum of their fusion/kernel
            # children (verified: 7.80 envelope vs 7.79 child sum)
            # — keep them out of the busy total to avoid 2x counting
            if not e["name"].startswith("jit_"):
                dev_total += d
            ts = e.get("ts", 0)
            t0 = min(t0, ts)
            t1 = max(t1, ts + d)
    return dev_dur, dev_total, (t1 - t0 if t1 > t0 else 0.0)


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import simulate, GENOME_LEN, READ_LEN, ERROR_RATE
    from mappy_rs_tpu import Aligner

    rng = np.random.default_rng(0)
    genome = bytes(
        np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, GENOME_LEN)]
    ).decode()
    reads, _ = simulate(rng, genome, 512, READ_LEN, ERROR_RATE)
    al = Aligner(seq=genome, preset="map-ont")
    al._engine.cfg.single_batch_shape = True
    al._engine.map_batch(reads[:256])  # warm + capture _probe_dispatch
    probe = al.probe_front_end(10)
    replay = al._engine._probe_dispatch

    logdir = "/tmp/fe_trace"
    jax.profiler.start_trace(logdir)
    wall0 = time.perf_counter()
    pend = []
    for _ in range(n_batches):  # depth-3 pipeline, like production
        pend.append(replay())
        if len(pend) >= 3:
            jax.block_until_ready(pend.pop(0))
    for h in pend:
        jax.block_until_ready(h)
    wall = time.perf_counter() - wall0
    jax.profiler.stop_trace()

    dev_dur, dev_total, dev_span = parse_trace(logdir)
    per_batch = dev_total / n_batches / 1e3
    print(f"pipelined wall: {1e3 * wall / n_batches:.2f} ms/batch "
          f"(probe_front_end said {1e3 * probe[0]:.2f})")
    print(f"TRACED device busy: {per_batch:.2f} ms/batch "
          f"({dev_total / 1e3:.1f} ms over {n_batches} batches; "
          f"duty {100 * dev_total / 1e6 / wall:.0f}% of traced wall)")
    print("top device ops (ms/batch):")
    for name, d in dev_dur.most_common(12):
        print(f"  {d / n_batches / 1e3:7.3f}  {name[:70]}")


if __name__ == "__main__":
    main()
