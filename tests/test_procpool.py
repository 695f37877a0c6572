"""Multi-process mapping runtime (runtime/procpool.py).

The streaming contract must hold unchanged when enable_threading's
workers proxy to child processes, and a read's result must be
bit-identical to the single-process path no matter which child maps
it (children run the unmodified engine on the mmap-shared index).
"""
import numpy as np
import pytest

from mappy_rs_tpu import Aligner


@pytest.fixture(scope="module")
def genome():
    rng = np.random.default_rng(11)
    return bytes(
        np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, 150_000)]
    ).decode()


@pytest.fixture(scope="module")
def payload(genome):
    rng = np.random.default_rng(12)
    out = []
    for i in range(48):
        s = int(rng.integers(0, len(genome) - 500))
        seq = genome[s : s + 500]
        if i % 3 == 0:  # revcomp a third of them
            comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
            seq = "".join(comp[c] for c in reversed(seq))
        out.append({"i": i, "seq": seq})
    return out


def test_procs_map_batch_identical_and_contract(genome, payload):
    # reference results: direct single-process mapping
    al = Aligner(seq=genome, preset="map-ont")
    direct = [
        al._to_mappings(r)
        for r in al._engine.map_batch(
            [d["seq"] for d in payload], cs=True, md=False
        )
    ]

    al2 = Aligner(seq=genome, preset="map-ont")
    al2._config.worker_processes = 1
    # small device batch: the child compiles a [32, L] graph instead of
    # the production [256, L] one (CPU-mesh compile time, not coverage)
    al2._config.device_batch_size = 32
    al2._config.proc_chunk = 48
    al2.enable_threading(2)
    assert al2._procs is not None, "worker processes failed to start"
    try:
        al2.warmup([payload[0]["seq"]])  # broadcast warm path
        got = {}
        for mappings, data in al2.map_batch(payload):
            got[data["i"]] = mappings
        assert len(got) == len(payload)
        for i in range(len(payload)):
            assert got[i] == direct[i]
        assert any(m for m in got.values()), "no read mapped at all"
        # child metrics are aggregated into the parent snapshot
        m = al2.metrics
        assert m.get("reads", 0) >= len(payload)
        # a second batch through the SAME pool (epoch barrier reuse)
        got2 = {data["i"]: maps for maps, data in al2.map_batch(payload[:10])}
        assert len(got2) == 10
        for i in got2:
            assert got2[i] == direct[i]
    finally:
        al2.enable_threading(0)
    assert al2._procs is None


def test_procs_error_contract(genome, payload):
    """Producer-side error texts are raised before any child work."""
    al = Aligner(seq=genome, preset="map-ont")
    al._config.worker_processes = 1
    al.enable_threading(1)
    try:
        with pytest.raises(KeyError, match="AHHH Key"):
            for _ in al.map_batch([{"id": 1}]):
                pass
    finally:
        al.enable_threading(0)
