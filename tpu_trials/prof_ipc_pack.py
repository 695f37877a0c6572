#!/usr/bin/env python
"""Measure the worker->parent IPC cost per read: current per-Mapping
pickling vs a packed-array block (few numpy arrays + byte blobs per
chunk).  The parent process is single-GIL; everything it spends on
deserialize + construct is stolen from the consumer iterator."""
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from mappy_rs_tpu.api import Mapping, Strand  # noqa: E402

N = 1024  # one proc_chunk


def make_mappings():
    rng = np.random.default_rng(0)
    out = []
    for i in range(N):
        cig = np.asarray(
            (rng.integers(1, 50, 20).astype(np.int32) << 4)
            | rng.integers(0, 3, 20).astype(np.int32)
        )
        cs = ":" + "1" * 950  # ~1kb cs tag, production-like
        out.append([
            Mapping(
                query_start=5, query_end=990,
                strand=Strand.Forward if i % 2 else Strand.Reverse,
                target_name="N/A", target_len=32_000_000,
                target_start=int(rng.integers(0, 3e7)),
                target_end=int(rng.integers(0, 3e7)),
                match_len=900, block_len=1000, mapq=60,
                is_primary=True, cigar=cig, NM=50, MD=None, cs=cs,
            )
        ])
    return out


def t(fn, n=20):
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    return (time.perf_counter() - t0) / n, r


def main():
    tables = make_mappings()

    dt_dump, blob = t(lambda: pickle.dumps(tables))
    dt_load, _ = t(lambda: pickle.loads(blob))
    print(f"current: dumps {dt_dump*1e6/N:.2f} us/read, "
          f"loads {dt_load*1e6/N:.2f} us/read, "
          f"blob {len(blob)/1e6:.2f} MB")

    # packed form: counts + fields + cig concat + cs blob
    def pack():
        counts = np.empty(N, np.int32)
        rows = []
        cigs = []
        cs_parts = []
        for i, ms in enumerate(tables):
            counts[i] = len(ms)
            for m in ms:
                c = m._cig
                cigs.append(c)
                b = m.cs.encode() if m.cs is not None else b""
                cs_parts.append(b)
                rows.append((
                    m.query_start, m.query_end,
                    0 if m._strand is Strand.Forward else 1,
                    0, m.target_start, m.target_end, m.match_len,
                    m.block_len, m.mapq, 1 if m.is_primary else 0,
                    m.NM, 0, len(c), len(b), -1,
                ))
        F = np.array(rows, np.int32)
        cig = np.concatenate(cigs) if cigs else np.empty(0, np.int32)
        blob_cs = b"".join(cs_parts)
        return counts, F, cig, blob_cs, b""

    dt_pack, packed = t(pack)
    dt_pdump, pblob = t(lambda: pickle.dumps(packed))
    dt_pload, up = t(lambda: pickle.loads(pblob))

    names = ["N/A"]
    lens_ = [32_000_000]

    def unpack():
        counts, F, cig, blob_cs, _ = up
        rows = F.tolist()
        out = []
        j = 0
        cig_off = 0
        cs_off = 0
        for i in range(N):
            ms = []
            for _ in range(counts[i]):
                r = rows[j]
                j += 1
                m = Mapping.__new__(Mapping)
                m.query_start = r[0]
                m.query_end = r[1]
                m._strand = Strand.Forward if r[2] == 0 else Strand.Reverse
                m.target_name = names[r[3]]
                m.target_len = lens_[r[3]]
                m.target_start = r[4]
                m.target_end = r[5]
                m.match_len = r[6]
                m.block_len = r[7]
                m.mapq = r[8]
                m.is_primary = bool(r[9])
                m.NM = r[10]
                m.trans_strand = r[11]
                m._cig = cig[cig_off:cig_off + r[12]]
                cig_off += r[12]
                m.cs = blob_cs[cs_off:cs_off + r[13]].decode() \
                    if r[13] >= 0 else None
                cs_off += max(r[13], 0)
                m.MD = None
                ms.append(m)
            out.append(ms)
        return out

    dt_unpack, out2 = t(unpack)
    print(f"packed : pack {dt_pack*1e6/N:.2f} us/read (child), "
          f"dumps {dt_pdump*1e6/N:.2f}, loads {dt_pload*1e6/N:.2f}, "
          f"unpack {dt_unpack*1e6/N:.2f} us/read (parent), "
          f"blob {len(pblob)/1e6:.2f} MB")
    # sanity
    a, b = tables[3][0], out2[3][0]
    assert a.target_start == b.target_start and a.cs == b.cs
    assert list(a.cigar) == list(b.cigar)
    print("parity ok")


if __name__ == "__main__":
    main()
