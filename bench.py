#!/usr/bin/env python
"""Benchmark: reads/sec/chip on an ONT-like mapping workload.

Workload (mirrors the reference's benchmark design, tests/benchmark.py
+ README table, scaled to what ships in-repo): simulated nanopore-like
reads (1 kb, 5% edits) against a synthetic 1 Mbp bacterial-scale
genome, mapped through the full map_batch streaming path (sketch ->
seed -> chain -> extend -> CIGAR) with the worker pool enabled.

Prints ONE JSON line:
  {"metric": "reads/sec/chip", "value": N, "unit": "reads/s",
   "vs_baseline": R}

vs_baseline anchors against the reference's only published numbers
(BASELINE.md): 5-thread mappy-rs on a 4-core 2018 MBP finished its
human-genome batch in 28.06 s vs 86.74 s single-thread.  The in-repo
proxy for that workload (unknown read count; data not shipped) is an
estimated 1,000 reads/s for a 32-thread v5p-host-class CPU run of
mappy-rs on ONT reads — the BASELINE.json target is >=5x that, i.e.
vs_baseline >= 5.0 at parity with the north-star goal.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_READS_PER_SEC = 1000.0  # estimated 32-thread mappy-rs host rate

GENOME_LEN = 1_000_000
N_READS = 1000
READ_LEN = 1000
ERROR_RATE = 0.05


def simulate(rng, genome: str, n: int, length: int, err: float):
    reads = []
    truth = []
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    for _ in range(n):
        start = int(rng.integers(0, len(genome) - length))
        truth.append(start)
        s = list(genome[start : start + length])
        # mixed substitutions/ins/del at the ONT-ish error rate
        i = 0
        out = []
        while i < len(s):
            r = rng.random()
            if r < err * 0.6:
                out.append(rng.choice([c for c in "ACGT" if c != s[i]]))
                i += 1
            elif r < err * 0.8:
                out.append(s[i])
                out.append(str(rng.choice(list("ACGT"))))
                i += 1
            elif r < err:
                i += 2
            else:
                out.append(s[i])
                i += 1
        read = "".join(out)[: length + 24]  # keep every read in one bucket
        if rng.random() < 0.5:
            read = "".join(comp[c] for c in reversed(read))
        reads.append(read)
    return reads, truth


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache: first-ever bench run pays the
    (remote) compile cost once; later runs start hot."""
    import jax

    try:
        if jax.default_backend() == "tpu":  # CPU AOT cache entries can
            # be machine-feature-mismatched (SIGILL risk); TPU only
            jax.config.update(
                "jax_compilation_cache_dir", "/root/.cache/jaxcache"
            )
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
    except Exception:
        pass


def main() -> None:
    """Run the measurement in a subprocess with a hard timeout and
    retry: the shared dev backend occasionally kills a run with a
    transient tunnel/TPU error (FAILED_PRECONDITION observed
    2026-08-17) or HANGS a device call outright (a 15-minute stall
    observed the same day) — and a missing JSON line costs the whole
    round's benchmark record.  Retries start against the warm
    persistent compile cache, so they are cheap."""
    import subprocess

    if "--once" in sys.argv:
        _run()
        return
    for attempt, tmo in enumerate((900, 900, 600)):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--once"],
                timeout=tmo,
            )
            if proc.returncode == 0:
                return
            print(f"# bench attempt {attempt + 1}: exit "
                  f"{proc.returncode}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"# bench attempt {attempt + 1}: timed out after "
                  f"{tmo}s (backend stall)", file=sys.stderr)
        time.sleep(45)
    raise SystemExit(1)


def _run() -> None:
    _enable_compile_cache()
    from mappy_rs_tpu import Aligner

    rng = np.random.default_rng(0)
    genome = "".join(rng.choice(list("ACGT"), size=GENOME_LEN))
    al = Aligner(seq=genome, preset="map-ont")
    al.enable_threading(4)

    reads, truth = simulate(rng, genome, N_READS, READ_LEN, ERROR_RATE)
    payload = [{"i": i, "seq": r} for i, r in enumerate(reads)]

    # warm-up: compile all shapes (same device batch size as the run;
    # the backend's first compile per process is slow — pay it here).
    # Both batch shapes (full B and the tiny-B straggler path) compile.
    n_hit = 0
    for _ in al.map_batch(payload[:256]):
        pass
    al.map(reads[0])

    n_correct = 0
    t0 = time.time()
    for mappings, data in al.map_batch(payload):
        if mappings:
            n_hit += 1
            m = mappings[0]
            if abs(m.target_start - truth[data["i"]]) < 100:
                n_correct += 1
    dt = time.time() - t0
    rps = N_READS / dt
    print(
        json.dumps(
            {
                "metric": "reads/sec/chip",
                "value": round(rps, 2),
                "unit": "reads/s",
                "vs_baseline": round(rps / BASELINE_READS_PER_SEC, 3),
            }
        )
    )
    m = al.metrics
    print(
        f"# accuracy: {n_correct}/{N_READS} within 100bp of truth; "
        f"mapped {n_hit}/{N_READS} reads in {dt:.2f}s "
        f"({READ_LEN}bp, {ERROR_RATE:.0%} err, {GENOME_LEN/1e6:.0f}Mbp ref); "
        f"dp_cells/s={m.get('dp_cells_per_sec', 0):.3e} "
        f"stage_times: front_end={m.get('time_front_end_s', 0)}s "
        f"extend={m.get('time_extend_s', 0)}s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
