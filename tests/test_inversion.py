"""Inversion rescue (mm_align1_inv) across zdrop splits.

minimap2 attempts to align the reverse complement of the query gap
between two zdrop-split halves against the reference gap, emitting an
opposite-strand region for small inversions — behavior behind every
reference ``.map()`` call (src/lib.rs:482 via the C core's ksw path).
Exercised here end-to-end: a read carrying an inverted (and lightly
mutated, so it cannot seed its own chain) segment must produce three
mappings — forward flanks plus the inverted middle on the other
strand with exact coordinates.
"""
import numpy as np
import pytest

from mappy_rs_tpu import Aligner

B = "ACGT"
COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def _s(rng, n):
    return "".join(B[i] for i in rng.integers(0, 4, n))


def _rc(x):
    return "".join(COMP[c] for c in reversed(x))


@pytest.fixture(scope="module")
def inv_case(tmp_path_factory):
    rng = np.random.default_rng(3)
    A, Bseg, C = _s(rng, 500), _s(rng, 800), _s(rng, 500)
    genome = _s(rng, 3000) + A + Bseg + C + _s(rng, 3000)
    p = tmp_path_factory.mktemp("inv") / "inv.fa"
    p.write_text(">c\n" + genome + "\n")
    # the inverted middle, mutated every 12bp so it cannot seed its own
    # chain (k=15 windows almost always contain a mutation) — the
    # rescue DP is the only way to place it
    bl = list(_rc(Bseg))
    n_mut = 0
    for i in range(5, len(bl), 12):
        bl[i] = B[(B.index(bl[i]) + 1) % 4]
        n_mut += 1
    read = A + "".join(bl) + C
    return str(p), read, n_mut


def test_inversion_rescued(inv_case):
    path, read, n_mut = inv_case
    al = Aligner(path)
    hits = al.map(read)
    inv = [h for h in hits if h.strand == -1]
    fwd = [h for h in hits if h.strand == 1]
    assert len(inv) == 1 and len(fwd) == 2
    h = inv[0]
    assert (h.q_st, h.q_en) == (500, 1300)
    assert (h.r_st, h.r_en) == (3500, 4300)
    assert h.NM == n_mut
    assert al._engine.metrics.counters.get("inv_rescues") == 1.0
    assert al._engine.metrics.counters.get("zdrop_splits") == 1.0
    # flanks are exact
    assert {(f.q_st, f.q_en) for f in fwd} == {(0, 500), (1300, 1800)}
    assert all(f.NM == 0 for f in fwd)


def test_inversion_rescued_on_reverse_read(inv_case):
    """The same read reverse-complemented: the inverted segment must
    come out on the FORWARD strand, flanks on reverse."""
    path, read, n_mut = inv_case
    al = Aligner(path)
    hits = al.map(_rc(read))
    inv = [h for h in hits if h.strand == 1]
    fwd = [h for h in hits if h.strand == -1]
    assert len(inv) == 1 and len(fwd) == 2
    assert (inv[0].r_st, inv[0].r_en) == (3500, 4300)
    assert inv[0].NM == n_mut


def test_no_false_inversions():
    """A plain chimeric junk gap (not an inversion) must split but NOT
    emit an opposite-strand region."""
    rng = np.random.default_rng(9)
    A, C = _s(rng, 500), _s(rng, 500)
    genome = _s(rng, 2000) + A + _s(rng, 800) + C + _s(rng, 2000)
    import os, tempfile

    read = A + _s(rng, 800) + C  # junk differs from the ref gap
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "g.fa")
        with open(p, "w") as f:
            f.write(">c\n" + genome + "\n")
        al = Aligner(p)
        hits = al.map(read)
        assert al._engine.metrics.counters.get("zdrop_splits", 0) >= 1
        assert not [h for h in hits if h.strand == -1]
