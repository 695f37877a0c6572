"""Multi-chip sharding: the full sharded map step on the virtual CPU
mesh (the driver's dryrun exercises the same path)."""
import numpy as np
import pytest


def test_sharded_map_step_8dev():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_index_key_range_sharding_roundtrip():
    from mappy_rs_tpu.index.build import load_or_build
    from mappy_rs_tpu.parallel.mesh import shard_index_by_key_range

    idx = load_or_build("/root/reference/resources/test/test.mmi")
    sh = shard_index_by_key_range(idx, 4)
    # every key appears in exactly one shard, in order
    keys = []
    for s in range(4):
        n = int(sh["n_keys"][s])
        hi = sh["key_hi"][s][:n].astype(np.uint64)
        lo = sh["key_lo"][s][:n].astype(np.uint64)
        keys.append((hi << np.uint64(32)) | lo)
    cat = np.concatenate(keys)
    assert np.array_equal(cat, idx.keys)
    # per-shard position counts match offsets
    total = sum(
        int(sh["counts"][s][: int(sh["n_keys"][s])].sum()) for s in range(4)
    )
    assert total == len(idx.positions)
