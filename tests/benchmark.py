"""Benchmark harness — analogue of the reference's tests/benchmark.py
(SURVEY.md §4 tier 3), self-contained on synthetic data since the
reference's human-genome inputs are not shipped either.

Not collected by pytest (no test_ functions); run directly:

    python tests/benchmark.py [n_reads] [read_len]

Prints a table of single-threaded map() vs map_batch() at 1..4 worker
threads, mirroring the reference README's comparison format.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def simulate(rng, genome, n, length, err=0.05):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    reads = []
    for _ in range(n):
        start = int(rng.integers(0, len(genome) - length))
        s = list(genome[start : start + length])
        out = []
        i = 0
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
        read = "".join(out)[: length + 24]
        if rng.random() < 0.5:
            read = "".join(comp[c] for c in reversed(read))
        reads.append(read)
    return reads


def main():
    from mappy_rs_tpu import Aligner

    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    read_len = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    rng = np.random.default_rng(0)
    genome = "".join(rng.choice(list("ACGT"), size=500_000))
    al = Aligner(seq=genome, preset="map-ont")
    reads = simulate(rng, genome, n_reads, read_len)
    payload = [{"i": i, "seq": r} for i, r in enumerate(reads)]

    # warm-up compiles
    al.enable_threading(1)
    for _ in al.map_batch(payload[: min(64, n_reads)]):
        pass
    for r in reads[:4]:
        al.map(r)

    rows = []
    t0 = time.time()
    n = sum(1 for r in reads if al.map(r))
    rows.append(("map() loop, single-threaded", time.time() - t0, n))
    for n_threads in (1, 2, 4):
        al.enable_threading(n_threads)
        t0 = time.time()
        n = sum(1 for m, _ in al.map_batch(payload) if m)
        rows.append((f"map_batch, {n_threads} thread(s)", time.time() - t0, n))

    print(f"\n{n_reads} reads x {read_len}bp vs 0.5Mbp genome")
    print(f"{'mode':<32}{'wall s':>10}{'reads/s':>10}{'mapped':>8}")
    for name, dt, n in rows:
        print(f"{name:<32}{dt:>10.2f}{n_reads/dt:>10.1f}{n:>8}")


if __name__ == "__main__":
    main()
