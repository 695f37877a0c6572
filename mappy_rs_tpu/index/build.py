"""Reference index builder: FASTA -> MinimizerIndex.

Equivalent of the C core's index construction path that the reference
drives through ``mm_idx_reader_read`` when handed a FASTA
(/root/reference/src/lib.rs:395-413, SURVEY.md §2b N2) — but instead of
pthread-parallel scalar sketching, contigs are sketched on-device with
the vectorized kernel (ops/sketch.py) in fixed-size overlapping chunks,
and only the emitted (key, pos, strand) triples return to the host for
the sort/unique pass.

Because the vectorized sketch is bit-exact with minimap2's semantics,
an index built here from FASTA is byte-identical (after .mmi
serialisation) to one produced by `minimap2 -d` with the same k/w —
validated against resources/test/test.mmi in tests/test_index.py.
"""
from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple

import numpy as np

from ..config import IndexOptions
from ..utils.seqcodes import encode, read_fastx
from .index import MinimizerIndex
from .mmi import load_mmi

# chunk size for device sketching of long contigs
_CHUNK = 1 << 20


def _sketch_contig_device(
    codes: np.ndarray, k: int, w: int, is_hpc: bool = False
) -> np.ndarray:
    """Sketch one contig with the device kernel; returns [n, 3] uint64
    rows (key, pos_end, strand).  With is_hpc the contig is
    homopolymer-compressed on the host first; emitted positions map
    back to uncompressed run-end coordinates."""
    import jax.numpy as jnp

    from ..ops.sketch import compress_hpc, hpc_spans, sketch

    pos_map_g = None
    force_g = None
    if is_hpc:
        cc, cl, run_end, run_len = compress_hpc(
            codes[None, :], np.asarray([len(codes)], np.int64)
        )
        spans = hpc_spans(run_len, k)
        n_c = int(cl[0])
        pos_map_g = run_end[0][:n_c]
        force_g = (spans[0] >= 256)[:n_c]
        codes = cc[0][:n_c]
    L = len(codes)
    left, right = w + 2 * k, w + 1
    out_rows: List[np.ndarray] = []
    start = 0
    while start < L:
        keep_end = min(start + _CHUNK, L)
        lo = max(start - left, 0)
        hi = min(keep_end + right, L)
        chunk = codes[lo:hi]
        # pad to the fixed chunk shape so jit compiles once
        pad_len = _CHUNK + left + right
        padded = np.full(pad_len, 4, np.uint8)
        padded[: len(chunk)] = chunk
        is_last = keep_end == L
        # true length: for the final chunk the D-clause (final flush)
        # must fire at the real contig end; for middle chunks the fake
        # end lies in the discarded right overlap (right > w-1), so any
        # spurious flush emission is dropped by the keep-window filter.
        eff_len = len(chunk)
        force_inf = None
        if force_g is not None:
            fpad = np.zeros(pad_len, bool)
            fpad[: len(chunk)] = force_g[lo:hi]
            force_inf = jnp.asarray(fpad[None, :])
        res = sketch(
            jnp.asarray(padded[None, :]),
            jnp.asarray([eff_len], np.int32),
            k,
            w,
            force_inf,
        )
        mask = np.asarray(res["minimizer"][0])
        pos_all = np.nonzero(mask)[0]
        keep_lo, keep_hi = start - lo, keep_end - lo
        if is_last:
            sel = (pos_all >= keep_lo) & (pos_all < keep_hi)
        else:
            sel = (pos_all >= keep_lo) & (pos_all < keep_hi)
        pos = pos_all[sel]
        kh = np.asarray(res["key_hi"][0])[pos].astype(np.uint64)
        kl = np.asarray(res["key_lo"][0])[pos].astype(np.uint64)
        strand = np.asarray(res["strand"][0])[pos].astype(np.uint64)
        key = (kh << np.uint64(32)) | kl
        abs_pos = (pos - keep_lo + start).astype(np.int64)
        if pos_map_g is not None:  # compressed -> uncompressed position
            abs_pos = pos_map_g[abs_pos]
        out_rows.append(
            np.stack([key, abs_pos.astype(np.uint64), strand], axis=1)
        )
        start = keep_end
    if not out_rows:
        return np.empty((0, 3), np.uint64)
    return np.concatenate(out_rows, axis=0)


def _sketch_contig_host(
    codes: np.ndarray, k: int, w: int, is_hpc: bool = False
) -> np.ndarray:
    from .sketch_host import sketch_host

    rows = [
        (t[0], t[2], t[3])
        for t in sketch_host(codes, k, w, 0, is_hpc=is_hpc)
    ]
    return np.asarray(rows, dtype=np.uint64).reshape(-1, 3)


def _sketch_contig_native(
    codes: np.ndarray, k: int, w: int, is_hpc: bool = False
):
    """C++ contig sketcher (native/front_end.cc sketch_contig — the
    same emission engine as the CPU read path, so bit-exact with the
    host/device sketchers).  ~60x the python host sketcher; returns
    None when the native lib is unavailable."""
    from .. import native

    res = native.sketch_contig(codes, k, w, is_hpc)
    if res is None:
        return None
    keys, y = res
    return np.stack(
        [keys, y >> np.uint64(1), y & np.uint64(1)], axis=1
    )


def build_index(
    seqs: Sequence[Tuple[str, str]],
    opts: IndexOptions | None = None,
    use_device: bool = True,
    n_threads: int = 0,
) -> MinimizerIndex:
    """Build a MinimizerIndex from (name, sequence) pairs.

    ``n_threads`` parallelizes contig sketching across host threads
    (the native sketcher releases the GIL inside the C call — the
    analogue of the reference's pthread index build,
    ``mm_idx_reader_read(n_threads)``, /root/reference/src/lib.rs:407).
    0 = one thread per CPU when the native sketcher is available.
    """
    opts = opts or IndexOptions()
    is_hpc = bool(opts.flag & 0x1)  # MM_I_HPC
    k, w = opts.k, opts.w
    names: List[str] = []
    lens: List[int] = []
    all_codes: List[np.ndarray] = []
    triples: List[np.ndarray] = []  # (key, y=rid<<32|pos<<1|strand)
    jobs: List[Tuple[int, np.ndarray]] = []  # (rid, codes) to sketch
    for rid, (name, seq) in enumerate(seqs):
        codes = seq if isinstance(seq, np.ndarray) else encode(seq)
        names.append(name)
        lens.append(len(codes))
        all_codes.append(codes)
        if len(codes) >= k:
            jobs.append((rid, codes))

    def _sketch_one(codes: np.ndarray) -> np.ndarray:
        rows = _sketch_contig_native(codes, k, w, is_hpc)
        if rows is None:
            rows = (
                _sketch_contig_device(codes, k, w, is_hpc)
                if use_device
                else _sketch_contig_host(codes, k, w, is_hpc)
            )
        return rows

    from .. import native as _native

    if n_threads <= 0:
        import os

        n_threads = os.cpu_count() or 1
    if n_threads > 1 and len(jobs) > 1 and _native.available():
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=n_threads) as ex:
            all_rows = list(ex.map(lambda j: _sketch_one(j[1]), jobs))
    else:
        all_rows = [_sketch_one(c) for _, c in jobs]
    key_parts: List[np.ndarray] = []
    y_parts: List[np.ndarray] = []
    for (rid, _), rows in zip(jobs, all_rows):
        if len(rows):
            key_parts.append(np.ascontiguousarray(rows[:, 0]))
            y_parts.append(
                (np.uint64(rid) << np.uint64(32))
                | (rows[:, 1] << np.uint64(1))
                | rows[:, 2]
            )
    triples = key_parts  # truthiness below

    if triples:
        keys_all = np.concatenate(key_parts)
        y_all = np.concatenate(y_parts)
        # stable sort by key only == lexsort((y, key)): rows are
        # appended in (rid, pos) order and a minimizer position holds
        # one strand, so within equal keys insertion order IS
        # y-ascending.  numpy's stable uint64 sort is radix — O(n),
        # which matters at GRCh38 scale (~10^8 rows).
        order = np.argsort(keys_all, kind="stable")
        keys_all = keys_all[order]
        positions = y_all[order]
        # keys_all is sorted: unique via neighbor-diff (np.unique
        # would sort a second time)
        if len(keys_all):
            mask = np.empty(len(keys_all), bool)
            mask[0] = True
            np.not_equal(keys_all[1:], keys_all[:-1], out=mask[1:])
            first = np.flatnonzero(mask)
            uniq = keys_all[first]
        else:
            uniq = keys_all
            first = np.empty(0, np.int64)
        offsets = np.concatenate([first, [len(keys_all)]]).astype(np.uint64)
    else:
        uniq = np.empty(0, np.uint64)
        offsets = np.zeros(1, np.uint64)
        positions = np.empty(0, np.uint64)

    return MinimizerIndex(
        k=k,
        w=w,
        bucket_bits=opts.bucket_bits,
        flag=opts.flag & 0x7,
        seq_names=names,
        seq_lens=np.asarray(lens, np.uint32),
        keys=uniq,
        key_offsets=offsets,
        positions=positions,
        ref_codes=np.concatenate(all_codes) if all_codes else np.empty(0, np.uint8),
    )


def load_or_build(path: str, opts: IndexOptions | None = None) -> MinimizerIndex:
    """Open a .mmi index or build one from FASTA/FASTQ — the behaviour
    of ``mm_idx_reader_open/read`` (lib.rs:395-413)."""
    with open(path, "rb") as fh:
        magic = fh.read(4)
    if magic == b"MMI\x02":
        idx = MinimizerIndex.from_raw(load_mmi(path))
        return idx
    from ..utils.seqcodes import read_fasta_codes

    return build_index(read_fasta_codes(path), opts)
