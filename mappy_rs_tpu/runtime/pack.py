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
