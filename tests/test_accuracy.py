"""Mapping-accuracy property tests: simulated reads with known origin
must map back to it (the concordance analogue of SURVEY §7 while no
mappy binary exists in-env to compare against)."""
import numpy as np
import pytest

import mappy_rs_tpu


def _simulate(rng, genome, n, length, err):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    out = []
    for _ in range(n):
        start = int(rng.integers(0, len(genome) - length))
        s = []
        i = start
        while i < start + length:
            r = rng.random()
            if r < err * 0.6:
                s.append(rng.choice([c for c in "ACGT" if c != genome[i]]))
                i += 1
            elif r < err * 0.8:
                s.append(genome[i])
                s.append(str(rng.choice(list("ACGT"))))
                i += 1
            elif r < err:
                i += 2
            else:
                s.append(genome[i])
                i += 1
        read = "".join(s)
        rev = rng.random() < 0.5
        if rev:
            read = "".join(comp[c] for c in reversed(read))
        out.append((read, start, rev))
    return out


@pytest.mark.parametrize("err", [0.0, 0.05, 0.12])
def test_simulated_read_accuracy(tmp_path, err):
    rng = np.random.default_rng(int(err * 100) + 1)
    genome = "".join(rng.choice(list("ACGT"), size=120_000))
    fa = tmp_path / "g.fa"
    fa.write_text(f">chr\n{genome}\n")
    al = mappy_rs_tpu.Aligner(str(fa))
    sims = _simulate(rng, genome, 60, 800, err)
    al.enable_threading(2)
    payload = [
        {"i": i, "seq": read} for i, (read, _, _) in enumerate(sims)
    ]
    n_correct = n_mapped = 0
    for mappings, data in al.map_batch(payload):
        if not mappings:
            continue
        n_mapped += 1
        m = mappings[0]
        read, start, rev = sims[data["i"]]
        if abs(m.target_start - start) < 100 and (m.strand == -1) == rev:
            n_correct += 1
    # 12% error ONT-like reads must still map nearly perfectly on a
    # unique random genome
    assert n_mapped >= 58, f"err={err}: only {n_mapped}/60 mapped"
    assert n_correct >= 57, f"err={err}: only {n_correct}/60 correct"


def test_n_heavy_reads(tmp_path):
    """Reads with N runs must still map via the remaining valid runs."""
    rng = np.random.default_rng(9)
    genome = "".join(rng.choice(list("ACGT"), size=50_000))
    fa = tmp_path / "g.fa"
    fa.write_text(f">chr\n{genome}\n")
    al = mappy_rs_tpu.Aligner(str(fa))
    start = 10_000
    read = list(genome[start : start + 900])
    read[300:310] = "N" * 10
    read[600:603] = "NNN"
    m = al.map("".join(read))
    assert m and abs(m[0].target_start - start) < 50


def test_read_spanning_contig_boundary_noise(tmp_path):
    """A chimera of two contigs must produce hits on the right contigs
    without a chain bleeding across the boundary."""
    rng = np.random.default_rng(11)
    g1 = "".join(rng.choice(list("ACGT"), size=20_000))
    g2 = "".join(rng.choice(list("ACGT"), size=20_000))
    fa = tmp_path / "g.fa"
    fa.write_text(f">c1\n{g1}\n>c2\n{g2}\n")
    al = mappy_rs_tpu.Aligner(str(fa))
    chimera = g1[5000:5600] + g2[9000:9600]
    hits = al.map(chimera)
    names = {h.target_name for h in hits}
    assert "c1" in names and "c2" in names
    for h in hits:
        if h.target_name == "c1":
            assert abs(h.target_start - 5000) < 60
            assert h.query_end <= 660
        else:
            assert abs(h.target_start - 9000) < 60
            assert h.query_start >= 540


def test_short_read_preset(tmp_path):
    """sr preset (k=21, w=11): 150bp single-end reads map accurately."""
    rng = np.random.default_rng(13)
    genome = "".join(rng.choice(list("ACGT"), size=80_000))
    fa = tmp_path / "g.fa"
    fa.write_text(f">chr\n{genome}\n")
    al = mappy_rs_tpu.Aligner(str(fa), preset="sr")
    assert al.k == 21 and al.w == 11
    n_ok = 0
    for _ in range(30):
        start = int(rng.integers(0, len(genome) - 150))
        read = list(genome[start : start + 150])
        for p in rng.choice(150, 2, replace=False):  # 2 mismatches
            read[p] = "ACGT"[("ACGT".index(read[p]) + 1) % 4]
        hits = al.map("".join(read))
        if hits and abs(hits[0].target_start - start) < 10:
            n_ok += 1
    assert n_ok >= 28, f"sr preset: only {n_ok}/30 correct"
