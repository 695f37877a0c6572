"""Native C++ fastx parser vs the python fallback: identical records
on every well-formed input shape (multi-line FASTA, comments, empty
lines, FASTQ, gzip)."""
import gzip

import pytest

import mappy_rs_tpu
from mappy_rs_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _both(path, read_comment=False, monkeypatch=None):
    nat = list(mappy_rs_tpu.fastx_read(str(path), read_comment))
    avail = native.available
    try:
        native.available = lambda: False
        py = list(mappy_rs_tpu.fastx_read(str(path), read_comment))
    finally:
        native.available = avail
    return nat, py


FASTA = (
    ">chr1 some comment  with   spaces\n"
    "ACGTACGT\nacgtNNNN\n"
    "\n"
    ">chr2\tcomment\tafter\ttab\n"
    "GGGG\n"
    ">\n"
    "TTTT\n"
    ">chr4\n\n"
    "AAAA\nCCCC"  # no trailing newline
)

FASTQ = (
    "@read1 first comment\n"
    "ACGTACGT\n"
    "+\n"
    "IIIIIIII\n"
    "\n"
    "@read2\n"
    "\n"  # empty sequence line is legal data
    "+anything\n"
    "!!\n"
    "@read3\n"
    "GG\n"
    "+\n"
    "II"  # no trailing newline
)


def test_fasta_parity(tmp_path):
    f = tmp_path / "a.fa"
    f.write_text(FASTA)
    for rc in (False, True):
        nat, py = _both(f, rc)
        assert nat == py
    nat, _ = _both(f)
    assert nat[0] == ("chr1", "ACGTACGTacgtNNNN", None)
    assert nat[2] == ("", "TTTT", None)
    nat, _ = _both(f, True)
    assert nat[0][3] == "some comment  with   spaces"
    assert nat[1][3] == "comment\tafter\ttab"
    assert nat[3][3] is None


def test_fastq_parity(tmp_path):
    """fastx_read routes FASTQ to the python loop (it measured faster);
    the native parser must still produce identical records when called
    directly."""
    f = tmp_path / "a.fq"
    f.write_text(FASTQ)
    expected = [
        ("read1", "ACGTACGT", "IIIIIIII"),
        ("read2", "", "!!"),
        ("read3", "GG", "II"),
    ]
    assert list(mappy_rs_tpu.fastx_read(str(f))) == expected
    nat = list(
        mappy_rs_tpu._fastx_native_records(FASTQ.encode(), False)
    )
    assert nat == expected
    nat_c = list(
        mappy_rs_tpu._fastx_native_records(FASTQ.encode(), True)
    )
    assert [r[3] for r in nat_c] == ["first comment", None, None]


def test_gzip_parity(tmp_path):
    f = tmp_path / "a.fa.gz"
    with gzip.open(f, "wt") as fh:
        fh.write(FASTA)
    nat, py = _both(f)
    assert nat == py and len(nat) == 4


def test_truncated_fastq_dropped():
    """A trailing FASTQ record missing its quality line is dropped by
    the native parser (the python loop raises instead — PEP 479)."""
    recs = list(
        mappy_rs_tpu._fastx_native_records(
            b"@r1\nACGT\n+\nIIII\n@r2\nGG\n+\n", False
        )
    )
    assert recs == [("r1", "ACGT", "IIII")]


def test_large_roundtrip(tmp_path):
    """1000-record files parse identically native vs python."""
    import numpy as np

    rng = np.random.default_rng(7)
    fq = []
    fa = []
    for i in range(1000):
        seq = "".join(rng.choice(list("ACGTN"), size=150))
        fq.append(f"@r{i} c{i}\n{seq}\n+\n{'I' * 150}\n")
        fa.append(f">r{i} c{i}\n{seq[:70]}\n{seq[70:]}\n")
    f = tmp_path / "big.fa"
    f.write_text("".join(fa))
    nat, py = _both(f, True)
    assert nat == py and len(nat) == 1000
    nat_fq = list(
        mappy_rs_tpu._fastx_native_records("".join(fq).encode(), True)
    )
    f2 = tmp_path / "big.fq"
    f2.write_text("".join(fq))
    assert nat_fq == list(mappy_rs_tpu.fastx_read(str(f2), True))
