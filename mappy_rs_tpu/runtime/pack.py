"""Packed result blocks for the worker-process IPC boundary.

The child used to construct per-read ``Mapping`` objects and pickle
them across the pipe (one object tree per hit: 16-field reduce tuple +
a cigar ndarray + ~1 kb cs string each).  Per-object pickling costs
~5 us/read on each side of the 4-core host budget (VERDICT r4 next #1
"glue/IPC").  A chunk's results now travel as ONE tuple of flat numpy
arrays + two byte blobs; the parent reconstructs ``Mapping`` objects
with direct slot writes.  Bit-parity: every Mapping field round-trips
exactly (tests/test_procpool_pack.py), including None-vs-"" cs/MD and
list-form cigars from the Python fallback path.

Layout (one block per mapped chunk of ``n`` unique reads):
  counts  int32 [n]        mappings per read, post no_2nd filter
  F       int32 [t, 15]    qs qe rev rid rs re mlen blen mapq primary
                           nm trans_strand cig_len cs_len md_len
                           (cs_len/md_len are -1 when the tag is None)
  cig     int32 [sum cig]  packed (len<<4|op) ops, concatenated
  cs_blob bytes            cs tags, concatenated
  md_blob bytes            MD tags, concatenated
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

_EMPTY_I32 = np.empty(0, np.int32)
_EMPTY_U8 = np.empty(0, np.uint8)


def _gather_segments(buf: np.ndarray, starts, lens) -> np.ndarray:
    """Concatenate buf[starts[i] : starts[i]+lens[i]] for every i,
    fully vectorized (one fancy-index gather)."""
    lens = np.asarray(lens, np.int64)
    total = int(lens.sum())
    if total == 0:
        return buf[:0]
    ends = np.cumsum(lens)
    # for each output position: its segment's cumulative start
    seg_base = np.repeat(ends - lens, lens)
    idx = np.repeat(np.asarray(starts, np.int64), lens) + (
        np.arange(total, dtype=np.int64) - seg_base
    )
    return buf[idx]


class PackedSink:
    """Collects a map_batch's results straight into the packed-block
    wire format, WITHOUT building per-read Region objects for the fused
    native fast path (VERDICT r5: the child spent its finalize timer on
    fields.tolist() + Region ctors + pack_regions_block re-flattening —
    all three cancel when post_chain.cc's flat output arrays are
    gathered vectorized into the block).

    Protocol: AlignmentEngine.map_batch_packed installs the sink;
    _post_chain_native calls add_native(chunk, res) per device chunk
    instead of materializing Regions (fallback reads excluded — the
    Python path finishes them into `out` as before, and anchor-overflow
    retries overwrite a read's earlier rowset via `src`).  finish(out)
    merges native rowsets with Python-path reads into one block, in
    read order, bit-identical to pack_regions_block over the Region
    path (tests/test_procpool_pack.py::test_packed_sink_parity)."""

    #: column order of the F[t,15] wire rows (module docstring)
    _QS, _QE, _REV, _RID, _RS, _RE, _MLEN, _BLEN = range(8)

    def __init__(self, n_reads: int, no_2nd: bool) -> None:
        self.no_2nd = no_2nd
        self.src = np.full(n_reads, -1, np.int64)
        self.rowsets: List[tuple] = []

    def add_native(self, chunk, nreg, fields, cig, ncig,
                   raw_tags, fallback) -> None:
        """One device chunk's post_chain.cc output -> compact rowset.
        chunk: global read index per batch row; fallback rows skipped."""
        from ..native import PC_FIELDS

        F = {n: i for i, n in enumerate(PC_FIELDS)}
        cs_buf, cs_len, md_buf, md_len, tag_cap = raw_tags
        B, K = ncig.shape
        chunk = np.asarray(chunk, np.int64)
        Bc = len(chunk)
        ok = ~fallback[:Bc].astype(bool)
        slot = np.arange(K)[None, :] < nreg[:Bc, None]
        mask = slot & ok[:, None]
        if self.no_2nd:
            mask &= (fields[:Bc, :, F["parent"]]
                     == fields[:Bc, :, F["id"]])
        bi, oi = np.nonzero(mask)  # row-major: read order, slot order
        rid = self.rowsets
        rs_id = len(rid)
        # mark ownership first (overwrites any earlier rowset's claim)
        self.src[chunk[ok]] = rs_id
        t = len(bi)
        rows = np.empty((t, 15), np.int32)
        fb = fields[bi, oi]
        rows[:, 0] = fb[:, F["qs"]]
        rows[:, 1] = fb[:, F["qe"]]
        rows[:, 2] = fb[:, F["rev"]]
        rows[:, 3] = fb[:, F["rid"]]
        rows[:, 4] = fb[:, F["rs"]]
        rows[:, 5] = fb[:, F["re"]]
        rows[:, 6] = fb[:, F["mlen"]]
        rows[:, 7] = fb[:, F["blen"]]
        rows[:, 8] = fb[:, F["mapq"]]
        rows[:, 9] = (fb[:, F["parent"]] == fb[:, F["id"]])
        rows[:, 10] = fb[:, F["nm"]]
        rows[:, 11] = 0  # trans_strand: fast path is non-splice
        nc = ncig[bi, oi].astype(np.int64)
        rows[:, 12] = nc
        cigcap = cig.shape[2]
        cig_blob = _gather_segments(
            cig.reshape(-1), (bi * K + oi) * cigcap, nc
        )

        def tag_blob(buf, lens_arr):
            v = lens_arr[bi, oi]
            have = v >= 0
            n = np.where(have, v & 0xFFFFFFFF, 0)
            tslot = (v >> 32)
            starts = (bi * K + tslot) * tag_cap
            blob = _gather_segments(buf, starts[have], n[have])
            return blob, np.where(have, n, -1).astype(np.int32)

        cs_blob, rows[:, 13] = tag_blob(cs_buf, cs_len)
        md_blob, rows[:, 14] = tag_blob(md_buf, md_len)
        rid.append((chunk[bi], rows, cig_blob, cs_blob, md_blob))

    def mark_python(self, reads) -> None:
        """Reads whose results will come from the Python Region path
        (fallback/splice/retry-to-python); drops any native claim."""
        if len(reads):
            self.src[np.asarray(reads, np.int64)] = -1

    def finish(self, regs_lists) -> tuple:
        """Merge native rowsets + Python-path reads -> one wire block
        in read order."""
        n = len(regs_lists)
        py_reads = np.nonzero(self.src < 0)[0]
        parts = []  # (read_idx, rows, cig_blob, cs_blob, md_blob)
        for rs_id, (ridx, rows, cigb, csb, mdb) in enumerate(self.rowsets):
            keep = self.src[ridx] == rs_id
            if keep.all():
                parts.append((ridx, rows, cigb, csb, mdb))
                continue
            # a later retry re-mapped some of this rowset's reads:
            # drop their rows AND their cig/cs/md segments
            nc = rows[:, 12].astype(np.int64)
            coff = np.cumsum(nc) - nc
            csn = np.where(rows[:, 13] >= 0, rows[:, 13], 0).astype(np.int64)
            csoff = np.cumsum(csn) - csn
            mdn = np.where(rows[:, 14] >= 0, rows[:, 14], 0).astype(np.int64)
            mdoff = np.cumsum(mdn) - mdn
            parts.append((
                ridx[keep], rows[keep],
                _gather_segments(cigb, coff[keep], nc[keep]),
                _gather_segments(csb, csoff[keep], csn[keep]),
                _gather_segments(mdb, mdoff[keep], mdn[keep]),
            ))
        if len(py_reads):
            cnts, F, cigb, csb, mdb = pack_regions_block(
                [regs_lists[i] for i in py_reads], self.no_2nd
            )
            parts.append((
                np.repeat(py_reads, cnts), F, cigb,
                np.frombuffer(csb, np.uint8), np.frombuffer(mdb, np.uint8),
            ))
        if not parts:
            return (np.zeros(n, np.int32), np.empty((0, 15), np.int32),
                    _EMPTY_I32, b"", b"")
        read_idx = np.concatenate([p[0] for p in parts])
        rows = np.vstack([p[1] for p in parts]).astype(np.int32, copy=False)
        cig_all = np.concatenate(
            [np.asarray(p[2], np.int32) for p in parts]
        )
        cs_all = np.concatenate([np.asarray(p[3], np.uint8) for p in parts])
        md_all = np.concatenate([np.asarray(p[4], np.uint8) for p in parts])
        order = np.argsort(read_idx, kind="stable")
        counts = np.bincount(read_idx, minlength=n).astype(np.int32)
        if not len(order) or bool((order[1:] > order[:-1]).all()):
            return (counts, rows, cig_all, cs_all.tobytes(),
                    md_all.tobytes())
        nc = rows[:, 12].astype(np.int64)
        coff = np.cumsum(nc) - nc
        csn = np.where(rows[:, 13] >= 0, rows[:, 13], 0).astype(np.int64)
        csoff = np.cumsum(csn) - csn
        mdn = np.where(rows[:, 14] >= 0, rows[:, 14], 0).astype(np.int64)
        mdoff = np.cumsum(mdn) - mdn
        return (
            counts,
            rows[order],
            _gather_segments(cig_all, coff[order], nc[order]),
            _gather_segments(cs_all, csoff[order], csn[order]).tobytes(),
            _gather_segments(md_all, mdoff[order], mdn[order]).tobytes(),
        )


def pack_regions_block(
    regs_lists, no_2nd: bool
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, bytes, bytes]:
    """Child side: finished per-read Region lists -> one packed block.

    Mirrors api.regions_to_mappings field-for-field (the parity test
    compares against it); regions with list-form cigars (Python
    fallback path) are packed through ops.cigar.pack_ops."""
    from ..ops.cigar import pack_ops

    counts = np.empty(len(regs_lists), np.int32)
    rows: List[tuple] = []
    cigs: List[np.ndarray] = []
    cs_parts: List[bytes] = []
    md_parts: List[bytes] = []
    for i, regs in enumerate(regs_lists):
        k = 0
        for r in regs:
            primary = r.parent == r.id
            if no_2nd and not primary:
                continue
            k += 1
            c = r.cigar
            if c is None:
                c = _EMPTY_I32
            elif type(c) is not np.ndarray:
                c = pack_ops(c)
            cigs.append(c)
            if r.cs is None:
                cs_len = -1
            else:
                b = r.cs.encode()
                cs_parts.append(b)
                cs_len = len(b)
            if r.md is None:
                md_len = -1
            else:
                b = r.md.encode()
                md_parts.append(b)
                md_len = len(b)
            rows.append((
                r.qs, r.qe, r.rev, r.rid, r.rs, r.re, r.mlen, r.blen,
                r.mapq, 1 if primary else 0, r.nm,
                getattr(r, "trans_strand", 0), len(c), cs_len, md_len,
            ))
        counts[i] = k
    F = (
        np.array(rows, np.int32)
        if rows else np.empty((0, 15), np.int32)
    )
    cig = np.concatenate(cigs) if cigs else _EMPTY_I32
    return counts, F, cig, b"".join(cs_parts), b"".join(md_parts)


def unpack_mappings_block(
    payload, seq_names, seq_lens
) -> List[list]:
    """Parent side: packed block -> per-read List[Mapping] lists."""
    from ..api import Mapping, Strand

    counts, F, cig, cs_blob, md_blob = payload
    rows = F.tolist()
    out: List[list] = []
    j = 0
    cig_off = 0
    cs_off = 0
    md_off = 0
    fwd, rev = Strand.Forward, Strand.Reverse
    new = Mapping.__new__
    for n in counts.tolist():
        ms = []
        for _ in range(n):
            (qs, qe, rv, rid, rs, re, mlen, blen, mapq, pri, nm, ts,
             ncig, ncs, nmd) = rows[j]
            j += 1
            m = new(Mapping)
            m.query_start = qs
            m.query_end = qe
            m._strand = fwd if rv == 0 else rev
            m.target_name = seq_names[rid]
            m.target_len = int(seq_lens[rid])
            m.target_start = rs
            m.target_end = re
            m.match_len = mlen
            m.block_len = blen
            m.mapq = mapq
            m.is_primary = bool(pri)
            m._cig = cig[cig_off:cig_off + ncig]
            cig_off += ncig
            if ncs >= 0:
                m.cs = cs_blob[cs_off:cs_off + ncs].decode()
                cs_off += ncs
            else:
                m.cs = None
            if nmd >= 0:
                m.MD = md_blob[md_off:md_off + nmd].decode()
                md_off += nmd
            else:
                m.MD = None
            m.NM = nm
            m.trans_strand = ts
            ms.append(m)
        out.append(ms)
    return out
