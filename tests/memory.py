"""Manual memory-stability harness — analogue of the reference's
tests/memory.py (SURVEY.md §4 tier 4; not collected by pytest).

Cycles reads through the aligner indefinitely (or --cycles N) while
printing RSS every report interval, to expose leaks in the streaming
runtime (queue churn, iterator churn, Mapping allocation).

    python tests/memory.py [--threaded] [--cycles N]
"""
import argparse
import os
import resource
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    from mappy_rs_tpu import Aligner

    ap = argparse.ArgumentParser()
    ap.add_argument("--threaded", action="store_true")
    ap.add_argument("--no-op", action="store_true")
    ap.add_argument("--cycles", type=int, default=50)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    genome = "".join(rng.choice(list("ACGT"), size=100_000))
    al = Aligner(seq=genome)
    reads = [
        genome[int(p) : int(p) + 500]
        for p in rng.integers(0, len(genome) - 500, 50)
    ]
    payload = [{"i": i, "seq": r} for i, r in enumerate(reads)]
    if args.threaded:
        al.enable_threading(2)

    base = None
    for cycle in range(args.cycles):
        if args.no_op:
            for r in reads:
                al.map_no_op(r)
        elif args.threaded:
            for _ in al.map_batch(payload):
                pass
        else:
            for r in reads:
                al.map(r)
        if cycle == 2:
            base = rss_mb()  # after warm-up allocations
        if cycle % 10 == 0 or cycle == args.cycles - 1:
            print(f"cycle {cycle:4d}  max_rss={rss_mb():8.1f} MB", flush=True)
    if base is not None:
        growth = rss_mb() - base
        print(f"rss growth after warm-up: {growth:.1f} MB")
        if growth > 200:
            print("WARNING: possible leak", file=sys.stderr)
            sys.exit(1)


if __name__ == "__main__":
    main()
