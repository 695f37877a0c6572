"""Index hand-off between processes via a directory of ``.npy`` files.

The multi-process runtime (runtime/procpool.py) spawns fresh
interpreters; re-building or re-parsing the index per child would cost
seconds to minutes at production scale.  Instead the parent dumps the
raw index arrays once and every child maps them back with
``np.load(mmap_mode="r")`` — the pages are shared through the OS page
cache, so N children cost one physical copy and near-zero load time.

(No reference analogue: the reference's worker threads share one C
``mm_idx_t`` in-process, /root/reference/src/lib.rs:545.  This module
is the cross-process equivalent of that shared read-only index.)
"""
from __future__ import annotations

import json
import os

import numpy as np

_ARRAYS = ("seq_lens", "keys", "key_offsets", "positions", "ref_codes")


def save_index_dir(index, d: str) -> None:
    """Dump a MinimizerIndex's raw arrays + metadata into directory d."""
    os.makedirs(d, exist_ok=True)
    for name in _ARRAYS:
        np.save(os.path.join(d, name + ".npy"), np.asarray(getattr(index, name)))
    meta = {
        "k": int(index.k),
        "w": int(index.w),
        "bucket_bits": int(index.bucket_bits),
        "flag": int(index.flag),
        "seq_names": list(index.seq_names),
    }
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_index_dir(d: str):
    """Reconstruct a MinimizerIndex from ``save_index_dir`` output.

    Arrays come back as read-only memory maps; every consumer (device
    upload, native front end, finalize) only reads them.
    """
    from .index import MinimizerIndex

    with open(os.path.join(d, "meta.json")) as f:
        meta = json.load(f)
    arrs = {
        name: np.load(os.path.join(d, name + ".npy"), mmap_mode="r")
        for name in _ARRAYS
    }
    return MinimizerIndex(
        k=meta["k"],
        w=meta["w"],
        bucket_bits=meta["bucket_bits"],
        flag=meta["flag"],
        seq_names=meta["seq_names"],
        **arrs,
    )
