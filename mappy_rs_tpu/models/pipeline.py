"""End-to-end alignment pipeline — the framework's flagship "model".

Drives the full map path the reference reaches through
``minimap2::Aligner::map`` (SURVEY.md §3.2): sketch (N7) -> seed
lookup (N8) -> chaining DP (N9) -> banded extension DP + traceback
(N10) -> primary marking + mapq (N11) -> cs/MD (N12), with the O(L)
inner loops on device (ops/*.py) and only O(result) glue on host.

Batching strategy (the TPU analogue of the reference's per-read worker
threads): reads are length-bucketed and padded so every device stage
runs lock-step on [B, L] arrays with static shapes; extension jobs are
re-bucketed by (query, target, band) size classes.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import MM_F_RMQ, MM_F_SPLICE, MM_F_SPLICE_FLANK
from ..config import MM_F_SPLICE_FOR as _MM_F_SPLICE_FOR
from ..config import MM_F_SPLICE_REV as _MM_F_SPLICE_REV
from ..config import MM_F_SR as _MM_F_SR
from ..config import AlignerConfig, MapOptions
from ..index.index import MinimizerIndex
from ..ops import cigar as cig
from ..ops.chain import ChainParams, chain_scores_block
from ..ops.chain_pallas import chain_scores_pallas
from ..ops.extend import ExtendParams, extend_dp
from ..ops.lookup import collect_anchors
from ..ops.regions import (
    Region,
    backtrack_chains,
    gen_regions,
    regions_from_compact,
    select_sub,
    set_mapq,
    set_parent,
)
from ..ops.sketch import sketch_compact
from ..utils.metrics import EngineMetrics
from ..utils.seqcodes import encode


# region part CIGARs are packed int32 (len<<4|op) arrays end-to-end
# (the extension engines' wire format); this is the canonical "empty"
_EMPTY_OPS = np.empty(0, np.int32)


def _pow2_at_least(n: int, lo: int = 1) -> int:
    p = lo
    while p < n:
        p <<= 1
    return p


from functools import partial  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _front_end_impl(
    codes, lens, sk_lens, hpc_force, hpc_pos_map, hpc_spans,
    key_hi, key_lo, offcnt, pos_rp, bucket_start, hash_rows, hash_val,
    n_keys, mid_occ, k, w, M, A, chain_params, chain_window, use_pallas,
    q_occ_frac=0.0, bucket_bits=0, bucket_rounds=0, bucket_shift=0,
    pallas_window=128, occ_dist=0, max_max_occ=0, packed=False,
    keys32=False, hash_bits=0, hash_shift=0,
):
    """Fused sketch -> seed lookup -> chain: ONE device dispatch per
    batch (the per-call tunnel latency on the dev setup is ~50-100ms,
    so call count matters as much as FLOPs).  For HPC indexes, `codes`
    are homopolymer-compressed with `sk_lens` compressed lengths and
    the hpc_* arrays mapping back to uncompressed coordinates; `lens`
    stays uncompressed (anchor coordinate transforms need it).

    ``packed=True``: `codes` arrive 4-bit-packed ([B, L//2], two codes
    per byte) and are expanded on device — uplink bytes are ~half the
    steady-state tunnel traffic, and the link is shared by every
    worker process."""
    if packed:
        codes = jnp.stack(
            [codes >> 4, codes & 0xF], axis=-1
        ).reshape(codes.shape[0], -1)
    mins = sketch_compact(
        codes, sk_lens, k, w, M,
        force_inf=hpc_force, pos_map=hpc_pos_map, spans=hpc_spans,
    )
    anchors = collect_anchors(
        mins, lens, key_hi, key_lo, offcnt, pos_rp,
        n_keys, mid_occ, A, k, q_occ_frac,
        bucket_start, bucket_bits, bucket_rounds, bucket_shift,
        occ_dist, max_max_occ, keys32,
        hash_rows, hash_val, hash_bits, hash_shift,
    )
    if use_pallas:
        f, p = chain_scores_pallas(anchors, chain_params, pallas_window)
    else:
        f, p = chain_scores_block(anchors, chain_params, chain_window)
    # pack for ONE device->host transfer (downloads are the scarce
    # resource on tunnel-attached chips):
    # meta = rev<<30 | valid<<29 | span<<21 | rid   (rid < 2^21)
    meta = (
        (anchors["rev"].astype(jnp.int32) << 30)
        | (anchors["valid"].astype(jnp.int32) << 29)
        | (jnp.clip(anchors["span"].astype(jnp.int32), 0, 255) << 21)
        | anchors["rid"].astype(jnp.int32)
    )
    stacked = jnp.stack(
        [meta, anchors["rpos"], anchors["qpos"], f, p], axis=0
    )
    return stacked, jnp.stack(
        [anchors["n"], anchors["n_raw"], anchors["rep_len"]]
    )


_front_end = partial(
    jax.jit,
    static_argnames=(
        "k", "w", "M", "A", "chain_params", "chain_window", "use_pallas",
        "q_occ_frac", "bucket_bits", "bucket_rounds", "bucket_shift",
        "pallas_window", "occ_dist", "max_max_occ", "packed", "keys32",
        "hash_bits", "hash_shift",
    ),
)(_front_end_impl)


def make_dp_front_end(mesh, is_hpc: bool, **static_kw):
    """Data-parallel front end: the SAME `_front_end_impl` body wrapped
    in `jax.shard_map` over the mesh's "data" axis — reads are sharded,
    the index arrays are replicated, so each device runs exactly the
    single-chip computation on its read slice (bitwise-identical
    outputs; BASELINE config 3's data-parallel full-CIGAR pipeline).
    Downstream (host backtrack -> regions -> extension -> CIGAR) is
    untouched."""
    PS = jax.sharding.PartitionSpec

    def inner(codes, lens, sk_lens, hpc_force, hpc_pos_map, hpc_spans,
              key_hi, key_lo, offcnt, pos_rp, bucket_start,
              hash_rows, hash_val, n_keys, mid_occ):
        return _front_end_impl(
            codes, lens, sk_lens, hpc_force, hpc_pos_map, hpc_spans,
            key_hi, key_lo, offcnt, pos_rp, bucket_start,
            hash_rows, hash_val, n_keys, mid_occ, **static_kw,
        )

    d2 = PS("data", None)
    d1 = PS("data")
    r = PS()
    # for absent (None) hpc args the spec has no leaves to bind; P()
    # keeps the pytree-prefix structure valid either way
    hpc_specs = (d2, d2, d2) if is_hpc else (r, r, r)
    in_specs = (d2, d1, d1) + hpc_specs + (r,) * 9
    out_specs = (PS(None, "data", None), PS(None, "data"))
    return jax.jit(
        jax.shard_map(
            inner, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    )


def make_sharded_front_end(mesh, is_hpc: bool, n_index: int, **static_kw):
    """Full-CIGAR front end with the INDEX SHARDED over the mesh's
    "index" axis (VERDICT r3 #6 — `enable_mesh` previously replicated
    the key/position tables per device; GRCh38-scale tables don't fit
    replicated).  Reads shard over "data" as in make_dp_front_end; the
    key-range shards (parallel/mesh.shard_index_by_key_range) shard
    over "index" with shard-local position offsets.

    Exactness: every query minimizer matches at most ONE key-range
    shard, so the global occurrence count is a psum over the index
    axis; the occurrence/rescue/q_occ filters run on that global count
    (identically on every shard), each shard expands only its own hits
    (budget A/n_index), and the merged all-gathered anchors are
    re-sorted with the same lexicographic keys — reproducing the
    single-device anchor array except for tie order and per-shard (vs
    global) truncation under A-budget overflow.
    """
    from ..ops.lookup import expand_anchors, filter_counts, probe_index

    PS = jax.sharding.PartitionSpec
    k = static_kw["k"]
    w = static_kw["w"]
    M = static_kw["M"]
    A = static_kw["A"]
    A_loc = max(A // n_index, 128)
    chain_params = static_kw["chain_params"]
    chain_window = static_kw["chain_window"]
    use_pallas = static_kw["use_pallas"]
    q_occ_frac = static_kw.get("q_occ_frac", 0.0)
    occ_dist = static_kw.get("occ_dist", 0)
    max_max_occ = static_kw.get("max_max_occ", 0)
    packed = static_kw.get("packed", False)
    pallas_window = static_kw.get("pallas_window", 128)

    def inner(codes, lens, sk_lens, hpc_force, hpc_pos_map, hpc_spans,
              key_hi, key_lo, offcnt, pos_rp, n_keys_sh, mid_occ):
        if packed:
            codes = jnp.stack(
                [codes >> 4, codes & 0xF], axis=-1
            ).reshape(codes.shape[0], -1)
        B = codes.shape[0]
        mins = sketch_compact(
            codes, sk_lens, k, w, M,
            force_inf=hpc_force, pos_map=hpc_pos_map, spans=hpc_spans,
        )
        found, oc = probe_index(
            mins, key_hi[0], key_lo[0], offcnt[0], n_keys_sh[0],
            keys32=False,
        )
        cnt_loc_raw = jnp.where(found, oc[..., 1], 0)
        # keys are range-disjoint across shards: psum = global count
        cnt_raw = jax.lax.psum(cnt_loc_raw, "index")
        found_glob = cnt_raw > 0
        cnt_glob, rep_len = filter_counts(
            mins, lens, found_glob, cnt_raw, mid_occ, k,
            q_occ_frac, occ_dist, max_max_occ,
        )
        # post-filter LOCAL counts: kept minimizers keep their (single)
        # owning shard's count
        cnt_loc = jnp.where((cnt_glob > 0) & found, cnt_loc_raw, 0)
        loc = expand_anchors(
            mins, lens, cnt_loc, oc[..., 0], pos_rp[0], A_loc, k
        )
        merged = {}
        for nm in ("rev", "rid", "rpos", "qpos", "span"):
            g = jax.lax.all_gather(loc[nm], "index")  # [n_idx, B, A_loc]
            merged[nm] = jnp.swapaxes(g, 0, 1).reshape(B, -1)
        gv = jax.lax.all_gather(loc["valid"], "index")
        valid = jnp.swapaxes(gv, 0, 1).reshape(B, -1)
        n = jnp.minimum(jax.lax.psum(loc["n"], "index"), A_loc * n_index)
        n_raw = jax.lax.psum(loc["n_raw"], "index")
        sort_first = jnp.where(valid, merged["rev"], 2)
        srt = jax.lax.sort(
            (sort_first, merged["rid"], merged["rpos"], merged["qpos"],
             valid.astype(jnp.int32), merged["span"]),
            dimension=1, num_keys=4,
        )
        anchors = {
            "rev": srt[0], "rid": srt[1], "rpos": srt[2],
            "qpos": srt[3], "valid": srt[4].astype(bool),
            "span": srt[5], "n": n, "n_raw": n_raw, "rep_len": rep_len,
        }
        if use_pallas:
            f, p = chain_scores_pallas(anchors, chain_params,
                                       pallas_window)
        else:
            f, p = chain_scores_block(anchors, chain_params, chain_window)
        meta = (
            (anchors["rev"].astype(jnp.int32) << 30)
            | (anchors["valid"].astype(jnp.int32) << 29)
            | (jnp.clip(anchors["span"].astype(jnp.int32), 0, 255) << 21)
            | anchors["rid"].astype(jnp.int32)
        )
        stacked = jnp.stack(
            [meta, anchors["rpos"], anchors["qpos"], f, p], axis=0
        )
        return stacked, jnp.stack(
            [anchors["n"], anchors["n_raw"], anchors["rep_len"]]
        )

    d2 = PS("data", None)
    d1 = PS("data")
    r = PS()
    i1 = PS("index")
    i2 = PS("index", None)
    i3 = PS("index", None, None)
    hpc_specs = (d2, d2, d2) if is_hpc else (r, r, r)
    in_specs = (d2, d1, d1) + hpc_specs + (i2, i2, i3, i3, i1, r)
    out_specs = (PS(None, "data", None), PS(None, "data"))
    return jax.jit(
        jax.shard_map(
            inner, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    )


@partial(
    jax.jit,
    static_argnames=(
        "k", "w", "M", "A", "chain_params", "chain_window", "use_pallas",
        "q_occ_frac", "bt_k", "bt_cuts", "min_cnt", "min_sc",
        "bucket_bits", "bucket_rounds", "bucket_shift",
        "pallas_window", "occ_dist", "max_max_occ", "packed", "keys32",
        "hash_bits", "hash_shift",
    ),
)
def _front_end_bt(
    codes, lens, sk_lens, hpc_force, hpc_pos_map, hpc_spans,
    key_hi, key_lo, offcnt, pos_rp, bucket_start, hash_rows, hash_val,
    n_keys, mid_occ, k, w, M, A, chain_params, chain_window, use_pallas,
    q_occ_frac, bt_k, bt_cuts, min_cnt, min_sc, bucket_bits=0,
    bucket_rounds=0, bucket_shift=0, pallas_window=128,
    occ_dist=0, max_max_occ=0, packed=False, keys32=False,
    hash_bits=0, hash_shift=0,
):
    """_front_end + on-device chain backtracking: the whole seeding and
    chaining path runs in one dispatch and only the compact
    [B, bt_k, 9+2*bt_cuts] chain table is downloaded (~5-7x less than
    the packed anchor stack — the dominant cost on tunnel links)."""
    from ..ops.backtrack_pallas import backtrack_chains_pallas

    if packed:
        codes = jnp.stack(
            [codes >> 4, codes & 0xF], axis=-1
        ).reshape(codes.shape[0], -1)
    mins = sketch_compact(
        codes, sk_lens, k, w, M,
        force_inf=hpc_force, pos_map=hpc_pos_map, spans=hpc_spans,
    )
    anchors = collect_anchors(
        mins, lens, key_hi, key_lo, offcnt, pos_rp,
        n_keys, mid_occ, A, k, q_occ_frac,
        bucket_start, bucket_bits, bucket_rounds, bucket_shift,
        occ_dist, max_max_occ, keys32,
        hash_rows, hash_val, hash_bits, hash_shift,
    )
    if use_pallas:
        f, p = chain_scores_pallas(anchors, chain_params, pallas_window)
    else:
        f, p = chain_scores_block(anchors, chain_params, chain_window)
    # aux row 1 (n_raw, pre-truncation hit count) rides the rep_len
    # download so the host can detect A-budget overflow on this path
    # too (minimap2 has no anchor cap; overflowed reads remap with a
    # boosted budget — VERDICT r4 weak #4)
    return backtrack_chains_pallas(
        anchors, f, p, bt_k, bt_cuts, min_cnt, min_sc
    ), jnp.stack([anchors["rep_len"], anchors["n_raw"]])


def _decode_front_end(arr: np.ndarray, n_np, rep_len):
    """Python fallback decode of the packed [5, B, A] front-end stack
    into the anchors dict consumed by ops/regions.backtrack_chains."""
    meta = arr[0]
    anchors_np = {
        "rev": (meta >> 30) & 1,
        "valid": ((meta >> 29) & 1).astype(bool),
        "span": (meta >> 21) & 255,
        "rid": meta & ((1 << 21) - 1),
        "rpos": arr[1],
        "qpos": arr[2],
        "n": n_np,
        "rep_len": rep_len,
    }
    return anchors_np, arr[3], arr[4]


@dataclass
class _ExtJob:
    region: Region
    kind: str  # 'left' | 'mid' | 'right'
    q: np.ndarray
    t: np.ndarray
    seg: int = 0  # segment index for multi-part mid alignments


class AlignmentEngine:
    """Batched aligner over one MinimizerIndex."""

    def __init__(
        self,
        index: MinimizerIndex,
        opt: MapOptions,
        cfg: Optional[AlignerConfig] = None,
    ):
        self.index = index
        self.opt = opt
        self.cfg = cfg or AlignerConfig()
        self._ext_params = ExtendParams(
            a=opt.a, b=opt.b, q=opt.q, e=opt.e, q2=opt.q2, e2=opt.e2,
            sc_ambi=opt.sc_ambi,
        )
        # band width class for flank extensions; same class as most mid
        # jobs so extension job groups share compiled kernels
        self.flank_band = 128
        # optional data-parallel device mesh (enable_mesh): the fused
        # front end runs shard_map over the "data" axis; everything
        # downstream is unchanged, so multi-chip map_batch returns
        # bitwise-identical Mappings to single-chip
        self.mesh = None
        self._dp_fes: Dict[tuple, Any] = {}
        self._index_shards = None  # enable_mesh(n_index > 1)
        self._packed_sink = None  # map_batch_packed installs (pack.py)
        self.metrics = EngineMetrics()
        max_gap_ref = opt.max_gap_ref if opt.max_gap_ref >= 0 else opt.max_gap
        self.is_splice = bool(opt.flag & MM_F_SPLICE)
        self._chain_params = ChainParams(
            max_dist_x=max_gap_ref,
            max_dist_y=opt.max_gap,
            bw=opt.bw,
            q_span=index.k,
            chn_pen_gap=opt.chain_gap_scale * 0.01 * index.k,
            chn_pen_skip=opt.chain_skip_scale * 0.01 * index.k,
            is_splice=int(self.is_splice),
        )

    # ------------------------------------------------------------------
    @property
    def dev(self):
        """Device index arrays, uploaded lazily on first device-path
        use (a CPU-front-end engine on a tunnel-attached chip should
        not pay the index upload at construction)."""
        return self.index.device

    def map_batch(
        self, seqs: Sequence[str], cs: bool = False, md: bool = False
    ) -> List[List[Region]]:
        """Map a batch of reads; returns per-read region lists (aligned,
        mapq'd, primary-marked), best first."""
        out: List[List[Region]] = [[] for _ in seqs]
        with self.metrics.timer("map_batch"):
            self.metrics.add("reads", len(seqs))
            codes = [encode(s) for s in seqs]
            # MM_F_RMQ presets (asm5/10/20, --rmq) need the long-gap
            # chaining pass, which lives in the native front end (the
            # device kernel's block window can't reach bw_long=100k
            # diagonal offsets) — assembly-to-reference alignment is an
            # offline host-bound workload, so this routing costs the
            # streaming path nothing.  Without the native lib the
            # device front end still maps, minus long SV joins.
            want_cpu = self.cfg.front_end_backend == "cpu" or bool(
                self.opt.flag & MM_F_RMQ
            )
            if want_cpu:
                from .. import native

                if native.available():
                    self._map_cpu(codes, out, cs, md)
                    return out
            # ---- length bucketing ----
            buckets: Dict[int, List[int]] = {}
            for i, c in enumerate(codes):
                L = self._bucket_len(len(c))
                buckets.setdefault(L, []).append(i)
            for L, idxs in buckets.items():
                self._map_bucket(L, idxs, codes, out, cs, md)
        return out

    def map_batch_packed(
        self, seqs: Sequence[str], cs: bool = False, md: bool = False,
        no_2nd: bool = False,
    ):
        """Map a batch straight into the packed wire-block format
        (runtime/pack.py module docstring).  Fast-path reads skip
        Region-object materialization entirely: post_chain.cc's flat
        arrays are gathered vectorized into the block; only
        fallback/splice/python-path reads go through Region lists.
        Bit-identical to pack_regions_block(map_batch(...)) —
        tests/test_procpool_pack.py::test_packed_sink_parity."""
        from ..runtime.pack import PackedSink

        sink = PackedSink(len(seqs), no_2nd)
        self._packed_sink = sink
        try:
            out = self.map_batch(seqs, cs=cs, md=md)
        finally:
            self._packed_sink = None
        with self.metrics.timer("finalize"):
            return sink.finish(out)

    def _map_cpu(
        self,
        codes: List[np.ndarray],
        out: List[List[Region]],
        cs: bool,
        md: bool,
    ) -> None:
        """Full-batch CPU mapping: native front end (sketch + lookup +
        chain + backtrack, native/front_end.cc) feeding the same
        extension/finalize pipeline.  No padding/bucketing needed —
        the scalar path is shape-free.  This is the reference-style
        CPU aligner (and the measured bench baseline)."""
        from .. import native

        od, mmo = self._seed_select_params()
        use_rmq = bool(self.opt.flag & MM_F_RMQ)
        with self.metrics.timer("front_end"):
            chains, rep_len, _n_anchors = native.front_end_batch(
                self.index, codes, self.opt.mid_occ, self._chain_params,
                self.cfg.cpu_chain_max_iter, self.opt.min_cnt,
                self.opt.min_chain_score, self.cfg.backtrack_k,
                8, self.SEG_LEN, occ_dist=od, max_max_occ=mmo,
                bw_long=int(self.opt.bw_long), use_rmq=use_rmq,
            )
        self._post_chain_tail(chains, rep_len, codes, out, cs, md)

    def _post_chain_tail(
        self,
        chains: np.ndarray,
        rep_len,
        codes: List[np.ndarray],
        out: List[List[Region]],
        cs: bool,
        md: bool,
    ) -> None:
        """Everything after compact chains are known: fused native
        post-chain for the fast path, Python regions + extension +
        finalize for fallback reads.  Shared by _map_cpu and the
        device-owner topology's post-chain workers (post_chain_packed)."""
        fb = self._post_chain_native(
            list(range(len(codes))), chains,
            np.asarray(rep_len, np.int32), codes, out, cs, md,
        )
        if fb is not None and not fb.any():
            return
        jobs: List[_ExtJob] = []
        read_regions: List[Tuple[int, List[Region], int]] = []
        for ri, c in enumerate(codes):
            if fb is not None and not fb[ri]:
                continue
            qlen = len(c)
            regions = regions_from_compact(chains[ri], qlen, self.index.k)
            set_parent(regions, self.opt.mask_level, self.opt.mask_len)
            regions = select_sub(regions, self.opt.pri_ratio, self.opt.best_n)
            read_regions.append((ri, regions, int(rep_len[ri])))
            jobs.extend(self._make_jobs(regions, c, qlen))
        self._run_jobs(jobs)
        self._run_split_rounds(read_regions, codes)
        self._finish_reads(read_regions, codes, out, cs, md)

    def post_chain_packed(
        self,
        codes: List[np.ndarray],
        chains: np.ndarray,
        rep_len: np.ndarray,
        cs: bool = True,
        md: bool = False,
        no_2nd: bool = False,
    ):
        """Device-owner topology worker entry point: compact chains
        (produced by the parent's device front end) -> finished packed
        wire block, all host-side (native post-chain fast path +
        Python fallback), no jax required in-process."""
        from ..runtime.pack import PackedSink

        with self.metrics.timer("map_batch"):
            self.metrics.add("reads", len(codes))
            sink = PackedSink(len(codes), no_2nd)
            self._packed_sink = sink
            out: List[List[Region]] = [[] for _ in codes]
            try:
                self._post_chain_tail(chains, rep_len, codes, out, cs, md)
            finally:
                self._packed_sink = None
            with self.metrics.timer("finalize"):
                return sink.finish(out)

    def _bucket_len(self, n: int) -> int:
        for b in self.cfg.length_buckets:
            if n <= b:
                return b
        return _pow2_at_least(n, self.cfg.length_buckets[-1])

    # ------------------------------------------------------------------
    def _map_bucket(
        self,
        L: int,
        idxs: List[int],
        codes: List[np.ndarray],
        out: List[List[Region]],
        cs: bool,
        md: bool,
        a_boost: int = 1,
    ) -> None:
        k = self.index.k
        B_real = len(idxs)
        B, M, A = self.fe_shapes(L, a_boost=a_boost, b_real=B_real)
        overflow_reads: List[int] = []
        import jax

        from .. import native

        use_bt = self._bt_enabled(B, A)
        bt_cuts = min(8, L // self.SEG_LEN)

        def stage_dispatch(chunk):
            """Pad + enqueue the fused front end for one chunk.  No
            device sync: jit calls return futures, so chunk i+1's
            device work overlaps chunk i's host stages (backtrack,
            regions, extension) — the dominant idle source at one
            in-flight batch per worker."""
            lens, handles = self._fe_submit_batch(
                [codes[ri] for ri in chunk], L, B, M, A, use_bt, bt_cuts
            )
            return chunk, lens, handles

        def stage_process(state):
            chunk, lens, handles = state
            chains_np = anchors_np = f = p = None
            rep_len = None
            native_bt = False
            if use_bt:
                with self.metrics.timer("front_end"):
                    chains_np, aux = jax.device_get(handles)
                    chains_np = np.asarray(chains_np)
                    aux = np.asarray(aux)
                    rep_len = aux[0]
                for bi in np.nonzero(aux[1][: len(chunk)] > A)[0]:
                    overflow_reads.append(chunk[int(bi)])
            else:
                with self.metrics.timer("front_end"):
                    arr, n_np, rep_len, n_raw = self._front_end_fetch(
                        handles, A
                    )
                for bi in np.nonzero(n_raw[: len(chunk)] > A)[0]:
                    overflow_reads.append(chunk[int(bi)])
                if native.available():
                    # C++ greedy backtrack straight off the packed
                    # download (no python meta-decode, no per-read walk)
                    chains_np = native.backtrack_compact_batch(
                        arr, self.opt.min_cnt, self.opt.min_chain_score,
                        self.cfg.backtrack_k, bt_cuts, self.SEG_LEN,
                    )
                    native_bt = chains_np is not None
                if not native_bt:
                    anchors_np, f, p = _decode_front_end(arr, n_np, rep_len)

            fb = None
            if use_bt or native_bt:
                fb = self._post_chain_native(
                    chunk, chains_np[: len(chunk)],
                    np.asarray(rep_len[: len(chunk)], np.int32),
                    codes, out, cs, md,
                )
                if fb is not None and not fb.any():
                    return
            jobs: List[_ExtJob] = []
            read_regions: List[Tuple[int, List[Region], int]] = []
            for bi, ri in enumerate(chunk):
                if fb is not None and not fb[bi]:
                    continue
                qlen = int(lens[bi])
                if use_bt or native_bt:
                    regions = regions_from_compact(
                        chains_np[bi], qlen, k
                    )
                else:
                    chains = backtrack_chains(
                        f[bi], p[bi], anchors_np["valid"][bi],
                        self.opt.min_cnt, self.opt.min_chain_score,
                    )
                    regions = gen_regions(chains, anchors_np, bi, qlen, k)
                set_parent(regions, self.opt.mask_level, self.opt.mask_len)
                regions = select_sub(regions, self.opt.pri_ratio, self.opt.best_n)
                read_regions.append((ri, regions, int(rep_len[bi])))
                jobs.extend(self._make_jobs(regions, codes[ri], qlen))

            self._run_jobs(jobs)
            self._run_split_rounds(read_regions, codes)
            self._finish_reads(read_regions, codes, out, cs, md)

        # software pipeline, depth cfg.pipeline_depth (default 3): up
        # to depth-1 dispatched batches in flight while one is
        # processed on host.  Depth 2 left bubbles on the
        # tunnel-attached chip: blocking round-trip latency (~35-47ms)
        # is ~3x the pipelined batch time, so jitter stalled the chip
        # whenever exactly one batch was in flight.
        from collections import deque

        depth = self.cfg.pipeline_depth
        pending = deque()
        for chunk_start in range(0, B_real, B):
            pending.append(
                stage_dispatch(idxs[chunk_start : chunk_start + B])
            )
            if len(pending) >= depth:
                stage_process(pending.popleft())
        while pending:
            stage_process(pending.popleft())

        if overflow_reads and a_boost < 16:
            # reads whose seed hits overflowed the A budget were mapped
            # from a truncated anchor set (minimap2 has no such cap) —
            # remap them with a 4x budget, overwriting their results
            self.metrics.add("anchor_overflow_retries", len(overflow_reads))
            self._map_bucket(
                L, overflow_reads, codes, out, cs, md, a_boost * 4
            )

    MAX_SPLITS = 3

    def _run_split_rounds(
        self,
        read_regions: List[Tuple[int, List[Region], int]],
        codes: List[np.ndarray],
    ) -> None:
        """Resolve zdrop splits: regions whose mid alignment truncated
        re-enter extension as (head, remainder) pairs until no segment
        zdrops (bounded rounds); then attempt inversion rescue across
        each split's gap (mm_align1_inv)."""
        for _ in range(self.MAX_SPLITS + 1):
            extra = self._split_zdropped(read_regions, codes)
            if not extra:
                break
            self._run_jobs(extra)
        self._inversion_rescue(read_regions, codes)

    def _split_zdropped(
        self,
        read_regions: List[Tuple[int, List[Region], int]],
        codes: List[np.ndarray],
    ) -> List[_ExtJob]:
        """mm_align1's zdrop chimeric/SV splitting: when a mid
        segment's global DP fell more than zdrop below its running max
        (ksw2 KSW_EZ_APPROX_DROP; /root/reference behavior behind
        src/lib.rs:482 via the C core), the region ends at the max
        cell and the remainder becomes a NEW region, re-extended with
        its own left flank toward the break.  Returns the new
        regions' extension jobs (caller runs them; a remainder can
        itself split again, up to MAX_SPLITS rounds)."""
        new_jobs: List[_ExtJob] = []
        ref = self.index.ref_codes
        offs = self.index.seq_offsets
        for ri, regions, _rl in read_regions:
            qlen = len(codes[ri])
            add: List[Region] = []
            for r in regions:
                zd = getattr(r, "_mid_zdrop", None)
                if not zd:
                    continue
                si = min(zd.keys())
                qc, tc = zd[si]
                segs = r._segs  # type: ignore[attr-defined]
                q0, _q1, t0, _t1 = segs[si]
                orig_re = r.re
                orig_qe_a = r._qe_a  # type: ignore[attr-defined]
                orig_right = getattr(r, "_right", (_EMPTY_OPS, 0, 0, 0))
                part = r._mid_parts[si]  # type: ignore[attr-defined]
                self.metrics.add("zdrop_splits", 1)
                # --- head: truncate r at the max cell ---
                if part is not None and len(part[0]):
                    r._mid_parts = r._mid_parts[: si + 1]
                    r.re = t0 + tc
                    r._qe_a = q0 + qc
                else:
                    # dropped immediately: end at the segment boundary
                    r._mid_parts = (
                        r._mid_parts[:si] if si > 0 else [(_EMPTY_OPS, 0)]
                    )
                    r.re = t0
                    r._qe_a = q0
                r._segs = segs[: si + 1]
                r._mid_zdrop = {}
                r._right = (_EMPTY_OPS, 0, 0, 0)  # no extension past a drop
                # --- remainder: new region from the next segment on ---
                n_splits = getattr(r, "_n_splits", 0)
                if si + 1 >= len(segs) or n_splits >= self.MAX_SPLITS:
                    continue
                qB0, tB0 = segs[si + 1][0], segs[si + 1][2]
                if orig_qe_a <= qB0 or orig_re <= tB0:
                    continue
                frac = (orig_qe_a - qB0) / max(orig_qe_a - r._qs_a, 1)  # type: ignore[attr-defined]
                rB = Region(
                    rev=r.rev,
                    rid=r.rid,
                    qs=qB0 if r.rev == 0 else qlen - orig_qe_a,
                    qe=orig_qe_a if r.rev == 0 else qlen - qB0,
                    rs=tB0,
                    re=orig_re,
                    score=max(int(r.score * frac), 1),
                    cnt=max(int(r.cnt * frac), 1),
                    anchors_qpos=np.asarray([qB0, orig_qe_a - 1], np.int32),
                    anchors_rpos=np.asarray([tB0, orig_re - 1], np.int32),
                )
                rB._q_al = r._q_al  # type: ignore[attr-defined]
                rB._qs_a = qB0  # type: ignore[attr-defined]
                rB._qe_a = orig_qe_a  # type: ignore[attr-defined]
                rB._segs = segs[si + 1 :]  # type: ignore[attr-defined]
                rB._n_mid = len(rB._segs)  # type: ignore[attr-defined]
                rB._mid_parts = [None] * len(rB._segs)  # type: ignore[attr-defined]
                rB._mid_zdrop = {}  # type: ignore[attr-defined]
                rB._n_splits = n_splits + 1  # type: ignore[attr-defined]
                rB._right = orig_right  # type: ignore[attr-defined]
                rB._inv_prev = r  # type: ignore[attr-defined]
                roff = int(offs[r.rid])
                q_al = rB._q_al  # type: ignore[attr-defined]
                for sj, (sq0, sq1, st0, st1) in enumerate(rB._segs):  # type: ignore[attr-defined]
                    new_jobs.append(
                        _ExtJob(
                            rB, "mid",
                            q_al[sq0:sq1],
                            ref[roff + st0 : roff + st1],
                            seg=sj,
                        )
                    )
                # left flank back toward the break (bounded by the gap)
                gap_q0 = r._qe_a  # type: ignore[attr-defined]
                bw = min(self.opt.bw, self.flank_band // 2)
                if qB0 > gap_q0:
                    tl0 = min(tB0 - r.re, (qB0 - gap_q0) + bw)
                    tl0 = max(tl0, 0)
                    if tl0 > 0:
                        new_jobs.append(
                            _ExtJob(
                                rB, "left",
                                q_al[gap_q0:qB0][::-1],
                                ref[roff + tB0 - tl0 : roff + tB0][::-1],
                            )
                        )
                    else:
                        rB._left = (_EMPTY_OPS, 0, 0, 0)  # type: ignore[attr-defined]
                else:
                    rB._left = (_EMPTY_OPS, 0, 0, 0)  # type: ignore[attr-defined]
                add.append(rB)
            regions.extend(add)
        return new_jobs

    def _inversion_rescue(
        self,
        read_regions: List[Tuple[int, List[Region], int]],
        codes: List[np.ndarray],
    ) -> None:
        """mm_align1_inv semantics: for each zdrop-split (head,
        remainder) pair with a gap on BOTH the query and the target,
        align the reverse complement of the query gap against the
        target gap (extension DP, zdrop_inv) under both anchorings —
        gap-left against target-left, and both reversed — and, when
        the better one clears min_dp_max, emit a new region on the
        OPPOSITE strand covering the inverted segment.  This is the
        small-inversion behavior behind every reference ``.map()``
        (ksw path of /root/reference/src/lib.rs:482); only the host
        extension path produces zdrop splits, so rescue runs there."""
        from .. import native

        if self.is_splice or not native.available():
            return
        ref = self.index.ref_codes
        offs = self.index.seq_offsets

        def parts_ok(x) -> bool:
            return hasattr(x, "_mid_parts") and all(
                p is not None and len(p[0]) for p in x._mid_parts
            )

        cand = []
        for ri, regions, _rl in read_regions:
            qlen = len(codes[ri])
            for rB in regions:
                r = getattr(rB, "_inv_prev", None)
                if r is None or not (parts_ok(r) and parts_ok(rB)):
                    continue
                lq = lt = 0
                left = getattr(rB, "_left", None)
                if left is not None:
                    _, _, lq, lt = left
                qg0, qg1 = r._qe_a, rB._qs_a - lq  # type: ignore[attr-defined]
                tg0, tg1 = r.re, rB.rs - lt
                QG, TG = qg1 - qg0, tg1 - tg0
                if QG < 16 or TG < 16:
                    continue
                if QG > self.opt.max_gap or TG > self.opt.max_gap:
                    continue
                q_inv = _revcomp(np.asarray(r._q_al[qg0:qg1]))  # type: ignore[attr-defined]
                roff = int(offs[r.rid])
                tgap = np.asarray(ref[roff + tg0 : roff + tg1])
                cand.append(
                    (regions, r, qg0, qg1, tg0, tg1, q_inv, tgap, qlen)
                )
        if not cand:
            return
        with self.metrics.timer("extend"):
            J = 2 * len(cand)
            QS = max(len(c[6]) for c in cand)
            TS = max(len(c[7]) for c in cand)
            qb = np.full((J, QS), 4, np.uint8)
            tb = np.full((J, TS), 4, np.uint8)
            ql = np.zeros(J, np.int32)
            tl = np.zeros(J, np.int32)
            for ci, c in enumerate(cand):
                q_inv, tgap = c[6], c[7]
                qb[2 * ci, : len(q_inv)] = q_inv
                qb[2 * ci + 1, : len(q_inv)] = q_inv[::-1]
                tb[2 * ci, : len(tgap)] = tgap
                tb[2 * ci + 1, : len(tgap)] = tgap[::-1]
                ql[2 * ci] = ql[2 * ci + 1] = len(q_inv)
                tl[2 * ci] = tl[2 * ci + 1] = len(tgap)
            res = native.extend_banded_batch(
                qb, tb, ql, tl, self.flank_band, self._ext_params,
                self.opt.end_bonus, 1, zdrop=self.opt.zdrop_inv,
            )
            self.metrics.add("dp_cells", float(J) * (QS + TS - 1) * self.flank_band)
        if res is None:
            return
        for ci, (regions, r, qg0, qg1, tg0, tg1, _qi, _tg, qlen) in enumerate(
            cand
        ):
            ra, rb_ = res[2 * ci], res[2 * ci + 1]
            use_b = rb_[1] > ra[1]
            ops, sc, qc, tc, _z = rb_ if use_b else ra
            if sc < self.opt.min_dp_max or qc < 16 or tc < 16:
                continue
            rev_i = 1 - r.rev
            if use_b:
                qs_a, qe_a = qlen - qg0 - qc, qlen - qg0
                rs_i, re_i = tg1 - tc, tg1
                ops = np.ascontiguousarray(ops[::-1])  # reversed DP frame
            else:
                qs_a, qe_a = qlen - qg1, qlen - qg1 + qc
                rs_i, re_i = tg0, tg0 + tc
            inv = Region(
                rev=rev_i,
                rid=r.rid,
                qs=qs_a if rev_i == 0 else qlen - qe_a,
                qe=qe_a if rev_i == 0 else qlen - qs_a,
                rs=rs_i,
                re=re_i,
                score=max(1, sc // max(self.opt.a, 1)),
                cnt=2,
                anchors_qpos=np.asarray([qs_a, qe_a - 1], np.int32),
                anchors_rpos=np.asarray([rs_i, re_i - 1], np.int32),
            )
            inv._q_al = _revcomp(np.asarray(r._q_al))  # type: ignore[attr-defined]
            inv._qs_a, inv._qe_a = qs_a, qe_a  # type: ignore[attr-defined]
            inv._segs = [(qs_a, qe_a, rs_i, re_i)]  # type: ignore[attr-defined]
            inv._n_mid = 1  # type: ignore[attr-defined]
            inv._mid_parts = [(ops, sc)]  # type: ignore[attr-defined]
            inv._mid_zdrop = {}  # type: ignore[attr-defined]
            inv._left = (_EMPTY_OPS, 0, 0, 0)  # type: ignore[attr-defined]
            inv._right = (_EMPTY_OPS, 0, 0, 0)  # type: ignore[attr-defined]
            regions.append(inv)
            self.metrics.add("inv_rescues", 1)

    def _finish_reads(
        self,
        read_regions: List[Tuple[int, List[Region], int]],
        codes: List[np.ndarray],
        out: List[List[Region]],
        cs: bool,
        md: bool,
    ) -> None:
        min_dp = self.opt.min_dp_max
        groups = []
        for ri, regions, rl in read_regions:
            # a region survives only if EVERY mid segment aligned
            # (an empty part would silently drop query/ref span)
            done = [
                r
                for r in regions
                if hasattr(r, "_mid_parts")
                and all(x is not None and len(x[0]) for x in r._mid_parts)
            ]
            groups.append((ri, done, rl))
        self._finalize_many(groups, codes, cs, md)
        for ri, done, rl in groups:
            # minimap2's min_dp_max: drop regions whose DP score is
            # below the floor (the `min_dp_score` ctor kwarg)
            done = [r for r in done if r.dp_score >= min_dp]
            done.sort(key=lambda r: (r.parent != r.id, -r.dp_score))
            out[ri] = done

    def probe_front_end(self, n: int = 10) -> List[float]:
        """Measure steady-state front-end seconds per batch by
        re-dispatching the LAST batch: [0] = PIPELINED throughput
        (n dispatches in flight / n — the chip-occupancy number),
        [1] = blocking round-trip latency of one dispatch (includes
        the full link RTT).  [] until a batch has run."""
        replay = getattr(self, "_probe_dispatch", None)
        if replay is None:
            return []
        import time as _time

        import jax

        jax.block_until_ready(replay())  # warm
        t0 = _time.perf_counter()
        jax.block_until_ready([replay() for _ in range(n)])
        thr = (_time.perf_counter() - t0) / n
        t0 = _time.perf_counter()
        jax.block_until_ready(replay())
        lat = _time.perf_counter() - t0
        return [thr, lat]

    def front_end_roofline(self) -> dict:
        """Algorithmic cost model of ONE front-end device batch, for
        roofline accounting (SURVEY §5 / VERDICT r3 missing #4): the
        integer-op count and the HBM bytes the graph must move, from
        the static shapes of the last dispatched batch.  Combined with
        the measured ms/batch (probe_front_end) this yields honest
        MFU / HBM-BW utilization figures.

        Op counts are algorithmic minimums (each emitted elementwise
        op once); HBM bytes count the gather windows plus one
        materialization per major [B, L] sketch intermediate (~30 —
        XLA fuses some, so this is an upper-ish estimate; the gathers
        dominate either way).  The published conclusion matters more
        than the third digit: the aligner front end is neither
        FLOP-bound nor bandwidth-bound — it is GATHER-OP-bound
        (~0.3-2 ms per dependent gather op regardless of element
        count, tpu_trials/trial_hashprobe.py), which is why the
        round-4 redesign minimizes gather OPs, not bytes."""
        shape = getattr(self, "_probe_shape", None)
        if shape is None:
            return {}
        B, L, M, A = shape
        k, w = self.index.k, self.index.w
        import jax

        on_tpu = jax.default_backend() == "tpu"
        W = (self.cfg.pallas_chain_window if on_tpu
             else 2 * self.cfg.chain_window)
        log2A = max(A - 1, 1).bit_length()
        int_ops = (
            B * L * (6 * k + 14 * w + 46)   # sketch (single-word path)
            + B * M * 300                    # probe compare + argmax
            + B * M * 250                    # filters (sorts, cummax)
            + B * A * 40                     # slot expansion
            + B * A * 6 * log2A * log2A      # anchor lex sort (bitonic)
            + B * A * W * 12                 # chain window max-plus DP
        )
        hbm_bytes = (
            B * L * (1 + 30 * 4)             # codes in + sketch interm.
            + B * M * (256 * 4 + 4 + 8)      # hash rows + val + offcnt
            + B * A * (8 + 8)                # meta + pos gathers
            + B * A * 6 * 4 * 2              # anchor arrays r/w
            + B * A * 4 * 8                  # chain anchor re-reads
        )
        return {
            "B": B, "L": L, "M": M, "A": A, "window": W,
            "int_ops": float(int_ops),
            "hbm_bytes": float(hbm_bytes),
        }

    def _bt_enabled(self, B: int = 256, A: int = 256) -> bool:
        # The device backtrack kernel (ops/backtrack_pallas.py) holds
        # its [B, A_pad] anchor arrays in scoped VMEM: ~10 s32 arrays
        # -> ~40*B*A bytes vs the 16 MB scoped limit.  B=256, A=4096
        # (an anchor-overflow retry at a_boost=16 on a repeat-dense
        # genome — first hit by the 3.1 Gbp artifact, 2026-08-21)
        # fails AOT with "Scoped allocation with size 40.91M ...
        # exceeded scoped vmem limit".  Oversized batches take the
        # host backtrack path (native backtrack_compact_batch), which
        # the non-bt fetch already uses; retries are rare, so the
        # extra downlink is noise.
        if B * A > 256 * 1024:
            return False
        mode = self.cfg.device_backtrack
        if mode == "on":
            return True
        if mode == "off":
            return False
        if self.mesh is not None:
            # the bt graph is single-device; auto must not bypass an
            # explicitly requested mesh front end
            return False
        # auto: on for TPU.  Re-measured 2026-08-17 after the native
        # compact-backtrack + bucketed-lookup rounds (tpu_trials/
        # prof_pipelined.py): pipelined B=256 front end is 29.3ms and
        # the bt variant 33.3ms, but bt downloads 205KB vs 655KB per
        # batch — on the ~15-30MB/s tunnel that trades +4ms device
        # time for ~25ms less link time per batch.  (Round 1 measured
        # the opposite with the python meta-decode downstream; the
        # call flipped once the host glue got cheap.)
        import jax

        return jax.default_backend() == "tpu"

    def enable_mesh(self, n_data: int = 0, n_index: int = 1) -> None:
        """Run the fused front end data-parallel over `n_data` local
        devices (shard_map over a Mesh "data" axis).  With
        ``n_index > 1`` the KEY/POSITION TABLES are additionally
        sharded into key-range shards over an "index" axis (VERDICT r3
        #6: nothing reference-sized is replicated), using the same
        contig-range/key-range shards as decision mode; the mesh is
        then (n_data x n_index) devices.  The host stages (backtrack,
        regions, extension, CIGAR) are unchanged, so results match
        single-chip bitwise (see make_sharded_front_end for the two
        documented divergences under anchor-budget overflow)."""
        import jax

        from ..parallel.mesh import make_mesh, shard_index_by_key_range

        if n_data <= 0:
            n_data = len(jax.devices()) // max(n_index, 1)
        self.mesh = make_mesh(n_data, n_index)
        self._dp_fes = {}
        self._index_shards = None
        if n_index > 1:
            import jax.numpy as jnp

            P = jax.sharding.PartitionSpec
            sh_np = shard_index_by_key_range(self.index, n_index)
            shards = {}
            # full-CIGAR path needs only the lookup tables (the packed
            # reference stays host-side for extension staging)
            for nm in ("key_hi", "key_lo", "offcnt", "pos_rp", "n_keys"):
                arr = sh_np[nm]
                spec = P("index", *([None] * (arr.ndim - 1)))
                shards[nm] = jax.device_put(
                    jnp.asarray(arr),
                    jax.sharding.NamedSharding(self.mesh, spec),
                )
            self._index_shards = shards

    @property
    def _fe_dev(self):
        """DeviceIndex for front-end dispatch: the real replicated
        tables, or an 8-element dummy when the index is sharded over
        the mesh (enable_mesh n_index > 1) — sharded mode must never
        trigger the replicated upload."""
        if self._index_shards is None:
            return self.dev
        d = getattr(self, "_dummy_dev", None)
        if d is None:
            import jax.numpy as jnp

            from ..index.index import DeviceIndex

            z = jnp.zeros(8, jnp.uint32)
            zi = jnp.zeros((8, 2), jnp.int32)
            d = DeviceIndex(
                key_hi=z, key_lo=z, offcnt=zi, pos_rp=zi, n_keys=0,
                log2_keys=1, keys32=False,
                bucket_start=jnp.zeros(8, jnp.int32),
            )
            self._dummy_dev = d
        return d

    def _seed_select_params(self):
        """Effective (occ_dist, max_max_occ) for seed thinning/rescue —
        the mm_collect_matches gate `dist > 0 && max_max_occ > max_occ`
        is resolved here on host (mid_occ is known after index load)
        so the device graphs stay static."""
        if (self.opt.occ_dist > 0
                and self.opt.max_max_occ > self.opt.mid_occ):
            return int(self.opt.occ_dist), int(self.opt.max_max_occ)
        return 0, 0

    def fe_shapes(self, L: int, a_boost: int = 1, b_real: int = 0):
        """Static device-batch shapes for the L bucket: (B, M, A).
        Only two batch shapes per bucket (tiny / full): worker-drain
        sizes vary run to run, and every new B is a fresh compile.
        Full size scales down for long-read buckets so [B, L] work
        arrays stay bounded (~256k cells/batch)."""
        w = self.index.w
        full_B = max(8, _pow2_at_least(
            max(self.cfg.device_batch_size * 1024 // L, 8)) // 1)
        full_B = min(full_B, self.cfg.device_batch_size)
        B = 8 if (
            0 < b_real <= 8 and not self.cfg.single_batch_shape
        ) else full_B
        if self.mesh is not None:  # shard_map needs B % n_data == 0
            nd = self.mesh.shape["data"]
            B = ((B + nd - 1) // nd) * nd
        M = max(64, L // max(w // 2, 1))
        A = max(256, int(L * self.cfg.anchors_per_base))
        A = _pow2_at_least(A) * a_boost
        return B, M, A

    def fe_submit(self, codes_sel, L: int, a_boost: int = 1):
        """Device-owner topology: dispatch ONE front-end batch (≤B
        reads of the L bucket) and return an opaque ticket for
        fe_collect.  No device sync; thread-safe (jit caches and
        metrics are)."""
        B, M, A = self.fe_shapes(L, a_boost=a_boost)
        if len(codes_sel) > B:
            raise ValueError(f"chunk of {len(codes_sel)} > batch {B}")
        use_bt = self._bt_enabled(B, A)
        bt_cuts = min(8, L // self.SEG_LEN)
        lens, handles = self._fe_submit_batch(
            codes_sel, L, B, M, A, use_bt, bt_cuts
        )
        return (handles, use_bt, A, bt_cuts, len(codes_sel))

    def fe_collect(self, ticket):
        """Block until a fe_submit ticket's device work is done; return
        (chains, rep_len, n_raw) sliced to the submitted reads —
        compact chain rows [n, K, 9+2*cuts] (regions_from_compact
        layout), exactly what post_chain_packed consumes.  Requires
        the native lib on the non-device-backtrack path."""
        import jax

        from .. import native

        handles, use_bt, A, bt_cuts, n = ticket
        if use_bt:
            with self.metrics.timer("front_end"):
                chains_np, aux = jax.device_get(handles)
                chains_np = np.asarray(chains_np)
                aux = np.asarray(aux)
            return chains_np[:n], aux[0][:n], aux[1][:n]
        with self.metrics.timer("front_end"):
            arr, n_np, rep_len, n_raw = self._front_end_fetch(handles, A)
        chains_np = native.backtrack_compact_batch(
            arr, self.opt.min_cnt, self.opt.min_chain_score,
            self.cfg.backtrack_k, bt_cuts, self.SEG_LEN,
        )
        if chains_np is None:
            raise RuntimeError(
                "device-owner topology requires the native runtime "
                "(backtrack_compact_batch) when device backtrack is off"
            )
        return chains_np[:n], np.asarray(rep_len[:n]), np.asarray(n_raw[:n])

    def _fe_submit_batch(
        self, codes_sel, L: int, B: int, M: int, A: int,
        use_bt: bool, bt_cuts: int,
    ):
        """Stage + dispatch ONE fused front-end batch (≤B reads, all in
        the L bucket); returns (lens, handles) without any device sync.
        Shared by _map_bucket's software pipeline and the device-owner
        topology's fe_submit (runtime/devowner.py)."""
        import jax
        import jax.numpy as jnp

        k, w = self.index.k, self.index.w
        batch = np.full((B, L), 4, np.uint8)
        lens = np.zeros(B, np.int32)
        for bi, c in enumerate(codes_sel):
            batch[bi, : len(c)] = c
            lens[bi] = len(c)
        # TPU: hand-written Mosaic chain kernel (predictable
        # compiles, H=128 window); elsewhere: XLA block formulation
        is_hpc = bool(self.index.flag & 0x1)
        pack = self.cfg.pack_uplink and not is_hpc
        if is_hpc:
            from ..ops.sketch import compress_hpc, hpc_spans

            cc, cl, run_end, run_len = compress_hpc(batch, lens)
            spans_np = hpc_spans(run_len, k)
            fe_codes = jnp.asarray(cc)
            fe_sklens = jnp.asarray(cl)
            fe_force = jnp.asarray(spans_np >= 256)
            fe_posmap = jnp.asarray(run_end)
            fe_spans = jnp.asarray(spans_np)
        else:
            # optionally 4-bit-pack the query upload (two codes per
            # byte); expanded on device in the front-end graph.
            # Uplink bytes halve — the tunnel is shared by every
            # worker process and runs near saturation at full rate.
            fe_codes = jnp.asarray(
                (batch[:, 0::2] << 4) | batch[:, 1::2]
            ) if pack else jnp.asarray(batch)
            fe_sklens = jnp.asarray(lens)
            fe_force = fe_posmap = fe_spans = None
        fe_dev = self._fe_dev  # dummy when the index is sharded:
        # the replicated device tables must never be built then
        fe_args = (
            fe_codes,
            jnp.asarray(lens),
            fe_sklens,
            fe_force,
            fe_posmap,
            fe_spans,
            fe_dev.key_hi,
            fe_dev.key_lo,
            fe_dev.offcnt,
            fe_dev.pos_rp,
            fe_dev.bucket_start,
            fe_dev.hash_rows,
            fe_dev.hash_val,
            jnp.int32(fe_dev.n_keys),
            jnp.int32(self.opt.mid_occ),
            k,
            w,
            M,
            A,
            self._chain_params,
            self.cfg.chain_window,
            jax.default_backend() == "tpu",
            float(self.opt.q_occ_frac),
            fe_dev.bucket_bits,
            fe_dev.bucket_rounds,
            fe_dev.bucket_shift,
            fe_dev.hash_bits,
            fe_dev.hash_shift,
        )
        self._probe_shape = (B, L, M, A)  # for front_end_roofline
        self.metrics.add("fe_batches", 1)
        self.metrics.add("fe_reads", len(codes_sel))
        # device chain-kernel cell updates this dispatch (the DP
        # the chip actually runs: B anchors x window predecessors)
        self.metrics.add(
            "chain_cells",
            float(B) * A * (
                self.cfg.pallas_chain_window
                if jax.default_backend() == "tpu"
                else self.cfg.chain_window * 2
            ),
        )
        with self.metrics.timer("front_end"):
            if use_bt:
                handles = self._fe_bt_dispatch(fe_args, bt_cuts, pack)
                # start the device->host DMA now, overlapped with
                # this chunk's remaining host stages — the blocking
                # device_get in stage_process was ~0.14 ms/read of
                # pure wait on the tunnel link
                try:
                    for h in handles:
                        h.copy_to_host_async()
                except Exception:  # noqa: BLE001 — optimization only
                    pass
            else:
                handles = self._fe_dispatch(fe_args, packed=pack)

        def _replay(use_bt=use_bt, fe_args=fe_args, pack=pack,
                    bt_cuts=bt_cuts):
            if use_bt:
                return self._fe_bt_dispatch(fe_args, bt_cuts, pack)
            return self._fe_dispatch(fe_args, packed=pack)

        # kept for probe_front_end (steady-state device ms/batch)
        self._probe_dispatch = _replay
        return lens, handles

    def _fe_bt_dispatch(self, fe_args, bt_cuts: int, pack: bool):
        """The fused front-end + device-backtrack graph call."""
        od, mmo = self._seed_select_params()
        return _front_end_bt(
            *fe_args[:23], self.cfg.backtrack_k, bt_cuts,
            self.opt.min_cnt, self.opt.min_chain_score,
            bucket_bits=fe_args[23], bucket_rounds=fe_args[24],
            bucket_shift=fe_args[25],
            pallas_window=self.cfg.pallas_chain_window,
            occ_dist=od, max_max_occ=mmo, packed=pack,
            keys32=self.dev.keys32,
            hash_bits=fe_args[26], hash_shift=fe_args[27],
        )

    def _fe_dispatch(self, fe_args, packed=False):
        """Dispatch the fused front end: single-device jit, or the
        cached shard_map'd data-parallel wrapper when a mesh is set."""
        od, mmo = self._seed_select_params()
        if self.mesh is None:
            return _front_end(
                *fe_args[:26],
                pallas_window=self.cfg.pallas_chain_window,
                occ_dist=od, max_max_occ=mmo, packed=packed,
                keys32=self.dev.keys32,
                hash_bits=fe_args[26], hash_shift=fe_args[27],
            )
        statics = fe_args[15:]
        is_hpc = fe_args[3] is not None
        if self._index_shards is not None:
            key = ("sharded", is_hpc) + tuple(statics) + (
                od, mmo, packed)
            fe = self._dp_fes.get(key)
            if fe is None:
                (k, w, M, A, chain_params, chain_window, use_pallas,
                 qof, _bb, _br, _bsh, _hb, _hs) = statics
                fe = make_sharded_front_end(
                    self.mesh, is_hpc,
                    int(self.mesh.shape["index"]),
                    k=k, w=w, M=M, A=A, chain_params=chain_params,
                    chain_window=chain_window, use_pallas=use_pallas,
                    q_occ_frac=qof,
                    pallas_window=self.cfg.pallas_chain_window,
                    occ_dist=od, max_max_occ=mmo, packed=packed,
                )
                self._dp_fes[key] = fe
            sh = self._index_shards
            return fe(
                *fe_args[:6], sh["key_hi"], sh["key_lo"], sh["offcnt"],
                sh["pos_rp"], sh["n_keys"], fe_args[14],
            )
        key = (is_hpc,) + tuple(statics) + (od, mmo, packed,
                                            self.dev.keys32)
        fe = self._dp_fes.get(key)
        if fe is None:
            (k, w, M, A, chain_params, chain_window, use_pallas, qof,
             bb, br, bsh, hb, hs) = statics
            fe = make_dp_front_end(
                self.mesh, is_hpc, k=k, w=w, M=M, A=A,
                chain_params=chain_params, chain_window=chain_window,
                use_pallas=use_pallas, q_occ_frac=qof,
                bucket_bits=bb, bucket_rounds=br, bucket_shift=bsh,
                pallas_window=self.cfg.pallas_chain_window,
                occ_dist=od, max_max_occ=mmo, packed=packed,
                keys32=self.dev.keys32,
                hash_bits=hb, hash_shift=hs,
            )
            self._dp_fes[key] = fe
        return fe(*fe_args[:15])

    def _front_end_fetch(self, handles, A: int):
        """Host-backtrack front end, download side: trims the transfer
        to the anchors actually present — optimistically fetches the
        first 128 slots together with the counts (one pipelined
        device_get) and refetches wider only when some read actually
        has more anchors.  Returns the RAW [5, B, A'] stack
        (meta, rpos, qpos, f, p) — the C++ backtrack consumes it
        directly without a python decode."""
        import jax

        stacked, n_dev = handles
        A_opt = min(128, A)
        arr, n2 = jax.device_get((stacked[:, :, :A_opt], n_dev))
        n2 = np.asarray(n2)
        n_np, n_raw, rep_len = n2[0], n2[1], n2[2]
        # observability for the A-budget truncation (minimap2 has no
        # anchor cap; reads that overflow lose hits silently otherwise)
        n_over = int((n_raw > A).sum())
        if n_over:
            self.metrics.add("anchor_overflow_reads", n_over)
        if int(n_np.max()) > A_opt:
            A_used = min(_pow2_at_least(int(n_np.max())), A)
            arr = np.asarray(stacked[:, :, :A_used])
        return np.asarray(arr), n_np, rep_len, n_raw

    # ------------------------------------------------------------------
    def _post_chain_params(self):
        """Cached (ip, dp) param blocks for native.post_chain_batch
        (post_chain.cc IP_* layout)."""
        blocks = getattr(self, "_pc_blocks", None)
        if blocks is None:
            p = self._ext_params
            ip = np.array(
                [
                    self.index.k,                       # IP_SPAN
                    self.opt.mask_len,
                    self.opt.best_n,
                    self.opt.min_dp_max,
                    p.a, p.b, p.q, p.e, p.q2, p.e2,
                    p.sc_ambi,
                    self.opt.end_bonus,
                    self.opt.zdrop,
                    self.opt.min_chain_score,
                    1 if (self.opt.flag & _MM_F_SR) else 0,
                    min(self.opt.bw, self.flank_band // 2),  # IP_BW
                    self.flank_band,
                    self.cfg.mid_band_floor,
                    self.cfg.mid_band_slack,
                    self.SEG_LEN,
                    0,                                  # IP_CIGCAP (wrapper)
                ],
                np.int32,
            )
            dp = np.array(
                [self.opt.mask_level, self.opt.pri_ratio], np.float64
            )
            blocks = self._pc_blocks = (ip, dp)
        return blocks

    def _post_chain_native(
        self,
        chunk,
        chains_np: np.ndarray,
        rep_len: np.ndarray,
        codes: List[np.ndarray],
        out: List[List[Region]],
        cs: bool,
        md: bool,
    ):
        """Fused C++ post-chain (post_chain.cc): regions + selection +
        extension + finalize + mapq for the whole batch in ONE native
        call, writing finished Region lists into `out`.  Returns the
        per-read fallback mask (reads the caller must remap through the
        Python path: zdrop splits -> inversion rescue, cap overflows),
        or None when the fast path does not apply (splice presets, a
        non-host extension backend, missing native lib)."""
        from .. import native

        if (
            self.is_splice
            or not self.cfg.post_chain_native
            or not native.available()
        ):
            return None
        backend = self.cfg.extension_backend
        if backend == "auto":
            backend = "host"
        if backend != "host":
            return None
        ip, dpar = self._post_chain_params()
        codes_list = [codes[ri] for ri in chunk]
        with self.metrics.timer("extend"):
            res = native.post_chain_batch(
                chains_np, codes_list, rep_len,
                self.index.ref_codes,
                self.index.seq_offsets, self.index.seq_lens,
                ip, dpar, cs, md,
            )
        if res is None:
            return None
        (nreg, fields, cig, ncig, cs_get, md_get, fallback, stats,
         raw_tags) = res
        self.metrics.add("dp_cells", float(stats[0]))
        self.metrics.add("post_chain_fallbacks", float(fallback.sum()))
        sink = self._packed_sink
        if sink is not None:
            # direct-to-wire: no Region objects for fast-path reads —
            # the sink gathers post_chain.cc's flat arrays into the
            # IPC block format (runtime/pack.py PackedSink)
            with self.metrics.timer("finalize"):
                sink.add_native(
                    chunk, nreg, fields, cig, ncig, raw_tags, fallback
                )
                fb_idx = np.nonzero(fallback[: len(chunk)])[0]
                if len(fb_idx):
                    sink.mark_python(
                        np.asarray(chunk, np.int64)[fb_idx]
                    )
            return fallback
        with self.metrics.timer("finalize"):
            for bi, ri in enumerate(chunk):
                if fallback[bi]:
                    continue
                n = int(nreg[bi])
                regs: List[Region] = []
                if n:
                    rows = fields[bi, :n].tolist()
                    for oi, f in enumerate(rows):
                        r = Region(
                            rev=f[0], rid=f[1], qs=f[2], qe=f[3],
                            rs=f[4], re=f[5], score=f[6], cnt=f[7],
                            anchors_qpos=_EMPTY_OPS,
                            anchors_rpos=_EMPTY_OPS,
                        )
                        r.id = f[8]
                        r.parent = f[9]
                        r.subsc = f[10]
                        r.n_sub = f[11]
                        r.dp_score = r.dp_max = f[12]
                        r.dp_max2 = f[13]
                        r.mapq = f[14]
                        r.mlen = f[15]
                        r.blen = f[16]
                        r.nm = f[17]
                        r.cigar = cig[bi, oi, : ncig[bi, oi]].copy()
                        if cs:
                            r.cs = cs_get(bi, oi)
                        if md:
                            r.md = md_get(bi, oi)
                        regs.append(r)
                out[ri] = regs
        return fallback

    def _make_jobs(
        self, regions: List[Region], codes: np.ndarray, qlen: int
    ) -> List[_ExtJob]:
        """Build left/mid/right extension jobs per region (mm_align1
        structure, single global mid instead of per-anchor segments)."""
        jobs: List[_ExtJob] = []
        ref = self.index.ref_codes
        offs = self.index.seq_offsets
        # flank ref overhang: the static band covers gaps up to ~W/2,
        # so a wider ref window than q + W/2 is unreachable anyway
        bw = min(self.opt.bw, self.flank_band // 2)
        if self.is_splice:
            # splice flanks run the UNBANDED intron-state DP, so the
            # window is a cost knob, not a band: allow a terminal exon
            # across an intron up to max_gap (2000 for splice presets)
            bw = max(bw, self.opt.max_gap)
        for r in regions:
            q_al = codes if r.rev == 0 else _revcomp(codes)
            qs_a = r.qs if r.rev == 0 else qlen - r.qe
            qe_a = r.qe if r.rev == 0 else qlen - r.qs
            r._q_al = q_al  # type: ignore[attr-defined]
            r._qs_a, r._qe_a = qs_a, qe_a  # type: ignore[attr-defined]
            roff = int(offs[r.rid])
            rlen = int(self.index.seq_lens[r.rid])
            # middle: global over the chained span.  Long regions are
            # split at chain anchors (minimap2's per-segment alignment)
            # so the band stays narrow regardless of read length.
            segs = self._mid_segments(r, qs_a, qe_a)
            r._segs = segs  # type: ignore[attr-defined]
            r._n_mid = len(segs)  # type: ignore[attr-defined]
            r._mid_parts = [None] * len(segs)  # type: ignore[attr-defined]
            r._mid_zdrop = {}  # type: ignore[attr-defined]
            for si, (q0, q1, t0, t1) in enumerate(segs):
                jobs.append(
                    _ExtJob(
                        r, "mid",
                        q_al[q0:q1],
                        ref[roff + t0 : roff + t1],
                        seg=si,
                    )
                )
            # left flank: reversed extension toward query start
            if qs_a > 0:
                tl0 = min(r.rs, qs_a + bw)
                if tl0 > 0:
                    jobs.append(
                        _ExtJob(
                            r,
                            "left",
                            q_al[:qs_a][::-1],
                            ref[roff + r.rs - tl0 : roff + r.rs][::-1],
                        )
                    )
                else:
                    r._left = (_EMPTY_OPS, 0, 0, 0)  # type: ignore[attr-defined]
            else:
                r._left = (_EMPTY_OPS, 0, 0, 0)  # type: ignore[attr-defined]
            # right flank
            if qe_a < qlen:
                tl1 = min(rlen - r.re, (qlen - qe_a) + bw)
                if tl1 > 0:
                    jobs.append(
                        _ExtJob(
                            r, "right", q_al[qe_a:], ref[roff + r.re : roff + r.re + tl1]
                        )
                    )
                else:
                    r._right = (_EMPTY_OPS, 0, 0, 0)  # type: ignore[attr-defined]
            else:
                r._right = (_EMPTY_OPS, 0, 0, 0)  # type: ignore[attr-defined]
        return jobs

    SEG_LEN = 384  # target query length per mid segment

    def _mid_segments(self, r: Region, qs_a: int, qe_a: int):
        """Split the chained span at anchors every ~SEG_LEN query bases.

        Anchors are exact k-mer matches, so cutting the global DP at an
        anchor's end cell is lossless for any near-optimal alignment
        (mm_align1 aligns anchor-to-anchor the same way)."""
        span = qe_a - qs_a
        if span <= 2 * self.SEG_LEN or len(r.anchors_qpos) < 3:
            return [(qs_a, qe_a, r.rs, r.re)]
        segs = []
        q_prev, t_prev = qs_a, r.rs
        last_q = int(r.anchors_qpos[0])
        for aq, at_ in zip(r.anchors_qpos[1:-1], r.anchors_rpos[1:-1]):
            aq, at_ = int(aq), int(at_)
            if aq - last_q >= self.SEG_LEN and aq + 1 - q_prev > 0:
                # cut AFTER this anchor's end cell (inclusive)
                if aq + 1 > q_prev and at_ + 1 > t_prev:
                    segs.append((q_prev, aq + 1, t_prev, at_ + 1))
                    q_prev, t_prev = aq + 1, at_ + 1
                    last_q = aq
        segs.append((q_prev, qe_a, t_prev, r.re))
        return [s for s in segs if s[1] > s[0] and s[3] > s[2]]

    # ------------------------------------------------------------------
    def _mid_band(self, drift: int) -> int:
        """Band width for an anchored mid segment: the known diagonal
        drift plus wander slack, 32-lane quantized (see
        AlignerConfig.mid_band_floor/_slack)."""
        need = 32 * ((drift + self.cfg.mid_band_slack + 31) // 32)
        return max(self.cfg.mid_band_floor, need)

    def _run_jobs(self, jobs: List[_ExtJob]) -> None:
        import jax.numpy as jnp

        if not jobs:
            return
        if self.is_splice:
            self._run_jobs_splice(jobs)
            return
        from .. import native

        native_ok = native.available()
        backend = self.cfg.extension_backend
        if backend == "auto":
            backend = "host" if native_ok else "device_dl"
        if backend == "host" and native_ok:
            self._run_jobs_host(jobs)
            return
        # small jobs (most flanks): full DP on host in C++ — cheaper
        # than a device dispatch and removes whole shape classes
        small: List[_ExtJob] = []
        rest: List[_ExtJob] = []
        for j in jobs:
            if native_ok and len(j.q) <= 64 and len(j.t) <= 160:
                small.append(j)
            else:
                rest.append(j)
        if small:
            self._run_small_jobs(small)
        jobs = rest
        # bucket by (QMAX, TMAX, W) size class
        groups: Dict[Tuple[int, int, int], List[_ExtJob]] = {}
        for j in jobs:
            ql, tl = len(j.q), len(j.t)
            if ql == 0 or tl == 0:
                self._store_empty(j)
                continue
            QMAX = _pow2_at_least(ql, 64)
            TMAX = _pow2_at_least(tl, 64)
            drift = abs(ql - tl)
            # static band: lane d of diagonal s is i = band_lo(s)+d, so
            # the W lanes cover j-i in [-W, W-2] (consecutive lanes
            # step j-i by 2).  A global job's end cell sits at
            # j-i = tlen-qlen, so W >= drift + wander margin; 64 j-i
            # units of margin covers ~64 net unmatched indels of path
            # wander within one anchored segment.
            if j.kind == "mid":
                W = self._mid_band(drift)
            else:
                # flank t-window is deliberately longer than q (ref
                # overhang); the band covers gaps up to ~flank_band/2
                W = self.flank_band
            W = min(W, _pow2_at_least(QMAX + TMAX, 128))
            groups.setdefault((QMAX, TMAX, W), []).append(j)
        for (QMAX, TMAX, W), grp in groups.items():
            # J cap: the Mosaic kernel's VMEM footprint is ~(4*J*W*4B
            # double-buffered blocks + 6 state vectors); 256x128 fits
            # the 16MB scoped budget with headroom
            J = min(_pow2_at_least(len(grp), 8), 256)
            for s in range(0, len(grp), J):
                sub = grp[s : s + J]
                q = np.full((J, QMAX), 4, np.uint8)
                t = np.full((J, TMAX), 4, np.uint8)
                ql = np.zeros(J, np.int32)
                tl = np.zeros(J, np.int32)
                for ji, job in enumerate(sub):
                    q[ji, : len(job.q)] = job.q
                    t[ji, : len(job.t)] = job.t
                    ql[ji] = len(job.q)
                    tl[ji] = len(job.t)
                import jax

                if backend == "device":
                    # fully device-resident: DP + traceback on chip,
                    # only the packed CIGAR table is downloaded
                    from ..ops.extend_pallas import extend_traceback_device

                    mode = np.asarray(
                        [0 if j.kind == "mid" else 1 for j in sub]
                        + [1] * (J - len(sub)),
                        np.int32,
                    )
                    with self.metrics.timer("extend"):
                        res_f = extend_traceback_device(
                            q, t, ql, tl, mode, W, self._ext_params,
                            self.opt.end_bonus,
                            max_ops=self.cfg.traceback_max_ops,
                        )
                        self.metrics.add(
                            "dp_cells",
                            float(len(sub)) * (QMAX + TMAX - 1) * W,
                        )
                    retry = self._apply_fused_results(sub, res_f)
                    if retry:
                        # ops-table overflow (indel-dense outliers):
                        # re-run those through the host engine
                        if native_ok:
                            self._run_jobs_host(retry)
                        else:
                            for job in retry:
                                self._store_empty(job)
                    continue

                with self.metrics.timer("extend"):
                    if jax.default_backend() == "tpu":
                        from ..ops.extend_pallas import extend_dp_pallas

                        res = extend_dp_pallas(
                            q, t, ql, tl, W, self._ext_params
                        )
                    else:
                        res = extend_dp(
                            jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql),
                            jnp.asarray(tl), QMAX, TMAX, W, self._ext_params,
                        )
                    # banded DP cell updates actually computed
                    self.metrics.add(
                        "dp_cells", float(len(sub)) * (QMAX + TMAX - 1) * W
                    )
                dirs = np.asarray(res["dirs"])
                best_sc = np.asarray(res["best_sc"])
                best_i = np.asarray(res["best_i"])
                best_j = np.asarray(res["best_j"])
                g_sc = np.asarray(res["g_sc"])
                g_j = np.asarray(res["g_j"])
                end_sc = np.asarray(res["end_sc"])
                # decide per-job traceback start cell + score
                NEGISH = -(1 << 27)
                starts = []  # (job_idx, kind, start_i, start_j, score)
                for ji, job in enumerate(sub):
                    if job.kind == "mid":
                        if int(end_sc[ji]) <= NEGISH:
                            # end cell unreachable within the band
                            self._store_empty(sub[ji])
                            continue
                        starts.append((ji, int(ql[ji]) - 1, int(tl[ji]) - 1,
                                       int(end_sc[ji])))
                    else:
                        use_end = (
                            int(g_sc[ji]) > NEGISH
                            and int(g_sc[ji]) + self.opt.end_bonus
                            >= int(best_sc[ji])
                        )
                        if use_end and int(g_sc[ji]) > 0:
                            starts.append((ji, int(ql[ji]) - 1, int(g_j[ji]),
                                           int(g_sc[ji])))
                        elif int(best_sc[ji]) > 0:
                            starts.append((ji, int(best_i[ji]),
                                           int(best_j[ji]),
                                           int(best_sc[ji])))
                        else:
                            self._store_empty(sub[ji])
                # batched native traceback; python fallback
                cigs = None
                if starts:
                    from .. import native

                    idxs = np.asarray([s[0] for s in starts], np.int32)
                    si = np.asarray([s[1] for s in starts], np.int32)
                    sj = np.asarray([s[2] for s in starts], np.int32)
                    cigs = native.traceback_batch(
                        np.ascontiguousarray(dirs[:, idxs, :]),
                        ql[idxs], tl[idxs], si, sj,
                        max_ops=2 * (QMAX + TMAX),
                    )
                    if cigs is None:
                        cigs = [
                            cig.pack_ops(cig.traceback_one(
                                dirs[:, ji, :], int(ql[ji]), int(tl[ji]),
                                W, s_i, s_j,
                            ))
                            for (ji, s_i, s_j, _) in starts
                        ]
                for (ji, s_i, s_j, sc), c in zip(starts, cigs or []):
                    job = sub[ji]
                    if job.kind == "mid":
                        job.region._mid_parts[job.seg] = (c, sc)  # type: ignore[attr-defined]
                    else:
                        setattr(
                            job.region, f"_{job.kind}",
                            (c, sc, s_i + 1, s_j + 1),
                        )

    def _apply_fused_results(
        self, sub: List[_ExtJob], res: Dict[str, np.ndarray]
    ) -> List[_ExtJob]:
        """Store per-job results of the device-resident traceback;
        returns jobs whose CIGAR overflowed the [J, OPS] table (the
        caller re-runs them on the host engine)."""
        ops_tab = res["ops"]
        info = res["info"]
        retry: List[_ExtJob] = []
        for ji, job in enumerate(sub):
            row = info[ji]
            n_o, fi, fj, sc = int(row[0]), int(row[1]), int(row[2]), int(row[3])
            started, ovf = int(row[4]), int(row[5])
            si0, sj0 = int(row[6]), int(row[7])
            if ovf:
                retry.append(job)
                continue
            if not started:
                self._store_empty(job)
                continue
            parts: List[Tuple[int, int]] = []
            # leading border gaps (the host walk emits these after the
            # in-band walk and reverses; reversed order is D then I)
            if fj >= 0:
                parts.append((fj + 1, 2))
            if fi >= 0:
                parts.append((fi + 1, 1))
            raw = ops_tab[ji, :n_o][::-1]
            parts.extend((int(v) >> 4, int(v) & 0xF) for v in raw)
            c = cig.pack_ops(cig.merge_cigars([parts]))
            if job.kind == "mid":
                job.region._mid_parts[job.seg] = (c, sc)  # type: ignore[attr-defined]
            else:
                setattr(
                    job.region, f"_{job.kind}", (c, sc, si0 + 1, sj0 + 1)
                )
        return retry

    def _run_jobs_splice(self, jobs: List[_ExtJob]) -> None:
        """Splice-mode extension: every job runs the intron-state DP
        (C++ splice_align_batch; ops/splice.py when the lib is absent).
        minimap2 aligns each region under both transcript senses when
        MM_F_SPLICE_FOR|REV are set and keeps the higher-scoring round
        (align.c's two-round splice loop); mirrored here per REGION so
        all segments share one sense.  The winning sense is recorded as
        trans_strand (+1/-1, 0 when no intron was found)."""
        with self.metrics.timer("extend"):
            senses = []
            if self.opt.flag & _MM_F_SPLICE_FOR:
                senses.append(1)
            if self.opt.flag & _MM_F_SPLICE_REV:
                senses.append(-1)
            if not senses:
                senses = [1]
            flank_sig = bool(self.opt.flag & MM_F_SPLICE_FLANK)
            by_region: Dict[int, List[_ExtJob]] = {}
            for j in jobs:
                by_region.setdefault(id(j.region), []).append(j)
            for jl in by_region.values():
                region = jl[0].region
                # a second sense only matters if some segment can hold
                # an intron (ref span materially exceeds query span)
                may_intron = any(len(x.t) - len(x.q) >= 20 for x in jl)
                use = senses if (may_intron and len(senses) > 1) else senses[:1]
                best = None
                for sense in use:
                    results = [
                        self._splice_one(x, sense, flank_sig) for x in jl
                    ]
                    tot = sum(r[1] for r in results)
                    if best is None or tot > best[0]:
                        best = (tot, sense, results)
                _, sense, results = best
                has_n = any(
                    len(r[0]) and bool(((np.asarray(r[0]) & 0xF) == 3).any())
                    for r in results
                )
                region.trans_strand = sense if has_n else 0
                for x, (ops, sc, qc, tc) in zip(jl, results):
                    if x.kind == "mid":
                        x.region._mid_parts[x.seg] = (ops, sc)  # type: ignore[attr-defined]
                    elif len(ops) or sc > 0:
                        setattr(x.region, f"_{x.kind}", (ops, sc, qc, tc))
                    else:
                        self._store_empty(x)

    def _splice_one(self, job: _ExtJob, sense: int, flank_sig: bool):
        """One splice DP job -> (packed ops, score, q_used, t_used)."""
        q, t = job.q, job.t
        if len(q) == 0 or len(t) == 0:
            return (_EMPTY_OPS, 0, 0, 0)
        from .. import native

        mode = 2 if job.kind == "mid" else 1
        rev = job.kind == "left"  # left flanks walk outward (reversed)
        o = self.opt
        self.metrics.add("dp_cells", float(len(q)) * len(t))
        if native.available():
            res = native.splice_align_batch(
                np.ascontiguousarray(q)[None, :],
                np.ascontiguousarray(t)[None, :],
                np.asarray([len(q)], np.int32),
                np.asarray([len(t)], np.int32),
                o.a, o.b, o.q, o.e, o.q2, o.noncan, o.sc_ambi,
                o.end_bonus, mode, sense, flank_sig, rev,
            )
            if res is not None:
                return res[0]
        from ..ops.splice import splice_align

        return splice_align(
            np.asarray(q), np.asarray(t), o.a, o.b, o.q, o.e, o.q2,
            o.noncan, o.sc_ambi, sense, flank_sig, mode, o.end_bonus, rev,
        )

    def _run_jobs_host(self, jobs: List[_ExtJob]) -> None:
        """All extension jobs through the C++ banded DP (bit-identical
        to the device kernels; avoids device->host dirs transfers).
        ONE native call per job batch: per-job band/mode over
        concatenated buffers (extend_jobs_batch) — the previous
        per-shape-group padded staging cost ~0.08 ms/read of numpy."""
        from .. import native

        with self.metrics.timer("extend"):
            sel: List[_ExtJob] = []
            Wv: List[int] = []
            modev: List[int] = []
            cells = 0.0
            for j in jobs:
                ql, tl = len(j.q), len(j.t)
                if ql == 0 or tl == 0:
                    self._store_empty(j)
                    continue
                # same band rule as _run_jobs (see comment there)
                if j.kind == "mid":
                    W = self._mid_band(abs(ql - tl))
                    modev.append(2)
                else:
                    W = self.flank_band
                    modev.append(1)
                Wv.append(W)
                sel.append(j)
                cells += float(ql + tl - 1) * W
            if not sel:
                return
            res = native.extend_jobs_batch(
                [j.q for j in sel], [j.t for j in sel],
                np.asarray(Wv, np.int32), np.asarray(modev, np.int32),
                self._ext_params, self.opt.end_bonus,
                zdrop=self.opt.zdrop,
            )
            self.metrics.add("dp_cells", cells)
            if res is None:
                for j in sel:
                    self._store_empty(j)
                return
            for j, mode, (ops, sc, qc, tc, zflag) in zip(sel, modev, res):
                if mode == 2:
                    j.region._mid_parts[j.seg] = (ops, sc)  # type: ignore[attr-defined]
                    if zflag:
                        # alignment truncated at the running-max
                        # cell: record the consumed spans so the
                        # caller splits the region (mm_align1's
                        # zdrop chimeric-split semantics)
                        j.region._mid_zdrop[j.seg] = (qc, tc)  # type: ignore[attr-defined]
                elif len(ops) or sc > 0:
                    setattr(j.region, f"_{j.kind}", (ops, sc, qc, tc))
                else:
                    self._store_empty(j)

    def _run_small_jobs(self, jobs: List[_ExtJob]) -> None:
        from .. import native

        with self.metrics.timer("extend_small"):
            for mode, kinds in ((0, ("mid",)), (1, ("left", "right"))):
                sel = [j for j in jobs if j.kind in kinds]
                if not sel:
                    continue
                QS = max(max(len(j.q) for j in sel), 1)
                TS = max(max(len(j.t) for j in sel), 1)
                q = np.full((len(sel), QS), 4, np.uint8)
                t = np.full((len(sel), TS), 4, np.uint8)
                ql = np.zeros(len(sel), np.int32)
                tl = np.zeros(len(sel), np.int32)
                for i, j in enumerate(sel):
                    q[i, : len(j.q)] = j.q
                    t[i, : len(j.t)] = j.t
                    ql[i], tl[i] = len(j.q), len(j.t)
                res = native.extend_small_batch(
                    q, t, ql, tl, self._ext_params, self.opt.end_bonus, mode
                )
                self.metrics.add("dp_cells", float((ql * tl).sum()))
                if res is None:  # native missing/overflow: device path
                    for j in sel:
                        self._store_empty(j)
                    continue
                for j, (ops, sc, qc, tc) in zip(sel, res):
                    if mode == 0:
                        j.region._mid_parts[j.seg] = (ops, sc)  # type: ignore[attr-defined]
                    elif len(ops) or sc > 0:
                        setattr(j.region, f"_{j.kind}", (ops, sc, qc, tc))
                    else:
                        self._store_empty(j)

    def _store_empty(self, job: _ExtJob) -> None:
        r = job.region
        if job.kind == "mid":
            r._mid_parts[job.seg] = (_EMPTY_OPS, 0)  # type: ignore[attr-defined]
        elif job.kind == "left":
            r._left = (_EMPTY_OPS, 0, 0, 0)  # type: ignore[attr-defined]
        else:
            r._right = (_EMPTY_OPS, 0, 0, 0)  # type: ignore[attr-defined]

    # ------------------------------------------------------------------
    def _finalize_many(
        self,
        groups: List[Tuple[int, List[Region], int]],
        codes: List[np.ndarray],
        cs: bool,
        md: bool,
    ) -> None:
        """Finalize every surviving region of a device batch at once:
        one python coordinate pass, ONE native finalize_batch call
        (CIGAR merge + stats + cs/MD for all regions of all reads),
        then the per-read set_parent/set_mapq tails.  Per-read native
        calls were the dominant host cost at high read rates (ctypes
        crossing + string buffer churn per read)."""
        with self.metrics.timer("finalize"):
            self._finalize_many_impl(groups, codes, cs, md)

    def _finalize_many_impl(
        self,
        groups: List[Tuple[int, List[Region], int]],
        codes: List[np.ndarray],
        cs: bool,
        md: bool,
    ) -> None:
        from .. import native

        ref = self.index.ref_codes
        offs = self.index.seq_offsets
        # pass 1 (pure python, cheap): final coords + part lists.
        # Part CIGARs arrive packed (int32 len<<4|op) from the
        # extension engines; they stay packed into the native finalize.
        flat: List[Region] = []
        all_parts: List[np.ndarray] = []
        part_rev: List[int] = []
        reg_off: List[int] = [0]
        qsegs: List[np.ndarray] = []
        t_off_l: List[int] = []
        t_len_l: List[int] = []
        for ri, regions, _rl in groups:
            qlen = len(codes[ri])
            for r in regions:
                parts = getattr(r, "_mid_parts", [(_EMPTY_OPS, 0)])
                mid_sc = sum(sc for _, sc in parts)
                left = getattr(r, "_left", (_EMPTY_OPS, 0, 0, 0))
                right = getattr(r, "_right", (_EMPTY_OPS, 0, 0, 0))
                lc, lsc, lq, lt = left
                rc, rsc, rq, rt = right
                r.dp_score = mid_sc + lsc + rsc
                r.dp_max = r.dp_score
                qs_a, qe_a = r._qs_a, r._qe_a  # type: ignore[attr-defined]
                r.q_st_a = qs_a - lq
                r.q_en_a = qe_a + rq
                r.r_st = r.rs - lt
                r.r_en = r.re + rt
                all_parts.append(lc)
                part_rev.append(1)  # left flank was walked outward
                for c, _ in parts:
                    all_parts.append(c)
                    part_rev.append(0)
                all_parts.append(rc)
                part_rev.append(0)
                reg_off.append(len(all_parts))
                q_al = r._q_al  # type: ignore[attr-defined]
                roff = int(offs[r.rid])
                qsegs.append(q_al[r.q_st_a : r.q_en_a])
                t_off_l.append(roff + r.r_st)
                t_len_l.append(r.r_en - r.r_st)
                # read-forward query coords
                if r.rev == 0:
                    r.qs, r.qe = r.q_st_a, r.q_en_a
                else:
                    r.qs, r.qe = qlen - r.q_en_a, qlen - r.q_st_a
                r.rs, r.re = r.r_st, r.r_en
                flat.append(r)
        t_off = np.asarray(t_off_l, np.int64)
        t_len = np.asarray(t_len_l, np.int64)
        # pass 2: merge + stats + cs/MD for the whole region batch in
        # one native call (or the python oracle if the lib is absent)
        res = (
            native.finalize_batch(
                [cig.pack_ops(p) for p in all_parts],
                np.asarray(part_rev, np.uint8),
                np.asarray(reg_off, np.int32),
                qsegs, ref, t_off, t_len, cs, md,
            )
            if flat and native.available() else None
        )
        if res is not None:
            merged, stats, cs_strs, md_strs = res
            for gi, r in enumerate(flat):
                # keep the native merge's packed int32 ops: Mapping
                # unpacks lazily, and packed arrays cross the worker-
                # process pipe far cheaper than [(n,op)] tuple lists
                r.cigar = merged[gi]
                r.mlen, r.blen, r.nm = (
                    int(stats[gi, 0]), int(stats[gi, 1]), int(stats[gi, 2])
                )
                if cs:
                    r.cs = cs_strs[gi]
                if md:
                    r.md = md_strs[gi]
        else:
            for gi, r in enumerate(flat):
                parts_l = [
                    cig.unpack_ops(p)
                    for p in all_parts[reg_off[gi] : reg_off[gi + 1]]
                ]
                full = cig.merge_cigars(
                    [cig.reverse_cigar(parts_l[0])] + parts_l[1:]
                )
                r.cigar = full
                qseg = qsegs[gi]
                tseg = ref[int(t_off[gi]) : int(t_off[gi] + t_len[gi])]
                r.mlen, r.blen, r.nm = cig.cigar_stats(full, qseg, tseg)
                if cs:
                    r.cs = cig.gen_cs(full, qseg, tseg)
                if md:
                    r.md = cig.gen_md(full, qseg, tseg)
        for _ri, regions, rep_len in groups:
            # minimap2 re-runs mm_set_parent on ALIGNED coordinates
            # before mm_set_mapq (extension can shift qs/qe enough to
            # change the primary/secondary partition) — mirror that.
            set_parent(regions, self.opt.mask_level, self.opt.mask_len)
            # dp_max2: best DP score among each primary's secondaries —
            # the DP-branch discriminator in mm_set_mapq
            by_id = {r.id: r for r in regions}
            for r in regions:
                r.dp_max2 = 0
            for r in regions:
                if r.parent != r.id:
                    parent = by_id.get(r.parent)
                    if parent is not None and r.dp_score > parent.dp_max2:
                        parent.dp_max2 = r.dp_score
            set_mapq(
                regions, self.opt, rep_len=rep_len,
                is_sr=bool(self.opt.flag & _MM_F_SR),
            )


def _revcomp(codes: np.ndarray) -> np.ndarray:
    return np.where(codes < 4, 3 - codes, codes).astype(np.uint8)[::-1]
