"""On-device chain backtracking (Mosaic kernel).

Replaces the host walk over the full [B, A] f/p arrays with a kernel
that extracts the top-K chains per read directly on device, so only a
compact [B, K*FLD] summary crosses the device->host link (~5-7x less
than the packed anchor transfer — which is the dominant cost on
bandwidth-starved links; see CLAUDE.md).

Semantics mirror ops/regions.py:backtrack_chains (minimap2's
mm_chain_backtrack, reference vendor minimap2 chain.c): candidate
ends are valid anchors with f >= min_chain_score, processed
best-score-first (ties: larger anchor index); each pass walks p[]
marking anchors used until it reaches a used anchor (join) or a chain
start; score = f[end] - f[join]; a chain is kept iff
count >= min_cnt and score >= min_chain_score — rejected walks still
consume their anchors, exactly as in the C code.  Only the first K
candidate ends are processed (host path has no such cap, but
select_sub keeps at most best_n secondaries anyway, so K >= best_n+3
loses nothing in practice).

Per kept chain the kernel also records up to SEG_CUTS interior anchors
at >= SEG_LEN query spacing, walking end->start (thresholds descend).
These are the segmentation cut points models/pipeline._mid_segments
needs to split long mid alignments at exact-match anchors — the host
never needs the full anchor list.

Mosaic notes: everything stays rank-2 ([B, A] anchor arrays,
[B, K*FLD] output, [B, 1] per-read registers) with lane-mask selects;
per-read random access v[b, cur[b]] is a masked lane reduction.  The
K passes are unrolled in Python so each pass's output slot offsets are
static; the walk is a fori_loop over A steps with finished reads
masked out.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32 = jnp.int32
NEG = -(1 << 30)

SEG_LEN = 384  # query spacing between cuts (= pipeline SEG_LEN)
# per-chain field layout (FLD = 9 + 2*seg_cuts lanes):
# 0 score, 1 cnt, 2 rev, 3 rid, 4 rpos_first, 5 rpos_last,
# 6 qpos_first, 7 qpos_last, 8 span_first,
# 9.. : (qpos, rpos) cut pairs in end->start order, -1 padded
N_FIXED = 9


def _make_kernel(B, A, K, seg_cuts, min_cnt, min_sc):
    FLD = N_FIXED + 2 * seg_cuts

    def kernel(f_ref, p_ref, valid_ref, rev_ref, rid_ref, rpos_ref,
               qpos_ref, span_ref, out_ref):
        lane = jax.lax.broadcasted_iota(_I32, (B, A), 1)
        laneK = jax.lax.broadcasted_iota(_I32, (B, K * FLD), 1)
        f = f_ref[:, :]
        p = p_ref[:, :]
        ok = valid_ref[:, :] != 0

        def col(v, cur):  # v[b, cur[b]] as [B, 1]; cur [B, 1], -1 -> 0
            return jnp.sum(jnp.where(lane == cur, v, 0), axis=1,
                           keepdims=True)

        used = jnp.zeros((B, A), _I32)
        out = jnp.full((B, K * FLD), -1, _I32)

        for kk in range(K):  # unrolled: static output slot offsets
            base = kk * FLD
            # best unused candidate end; ties -> larger anchor index
            fc = jnp.where(ok & (f >= min_sc) & (used == 0), f, NEG)
            best = jnp.max(fc, axis=1, keepdims=True)
            end = jnp.max(jnp.where(fc == best, lane, -1), axis=1,
                          keepdims=True)
            active0 = best > NEG  # [B, 1]: this read still has a chain
            endv = jnp.where(active0, end, -1)
            q_end = col(qpos_ref[:, :], endv)

            def walk(_, c):
                (used, cur, alive, cnt, join_f, q_first, r_first,
                 sp_first, n_cuts, next_cut, cuts) = c
                curv = jnp.where(alive, cur, -1)
                used = jnp.where((lane == curv) & alive, 1, used)
                qp = col(qpos_ref[:, :], curv)
                rp = col(rpos_ref[:, :], curv)
                # walk order is end->start: the current anchor is
                # always the earliest seen so far
                q_first = jnp.where(alive, qp, q_first)
                r_first = jnp.where(alive, rp, r_first)
                sp_first = jnp.where(
                    alive, col(span_ref[:, :], curv), sp_first)
                if seg_cuts > 0:
                    # record a segmentation cut when qpos crosses the
                    # (descending) threshold, capped at seg_cuts
                    do_cut = alive & (qp <= next_cut) & (n_cuts < seg_cuts)
                    slot = base + N_FIXED + 2 * n_cuts  # [B, 1]
                    cuts = jnp.where(do_cut & (laneK == slot), qp, cuts)
                    cuts = jnp.where(
                        do_cut & (laneK == slot + 1), rp, cuts)
                    n_cuts = jnp.where(do_cut, n_cuts + 1, n_cuts)
                    next_cut = jnp.where(do_cut, qp - SEG_LEN, next_cut)
                cnt = jnp.where(alive, cnt + 1, cnt)
                nxt = col(p, curv)
                nxt_used = col(used, nxt) > 0
                joins = alive & (nxt >= 0) & nxt_used
                join_f = jnp.where(joins, col(f, nxt), join_f)
                alive = alive & (nxt >= 0) & (~nxt_used)
                cur = jnp.where(alive, nxt, cur)
                return (used, cur, alive, cnt, join_f, q_first, r_first,
                        sp_first, n_cuts, next_cut, cuts)

            z = jnp.zeros((B, 1), _I32)
            cuts0 = jnp.full((B, K * FLD), -1, _I32)
            (used, _, _, cnt, join_f, q_first, r_first, sp_first,
             _, _, cuts) = jax.lax.fori_loop(
                0, A, walk,
                (used, endv, active0, z, z, z, z, z, z,
                 q_end - SEG_LEN, cuts0),
            )
            sc = col(f, endv) - join_f
            keep = active0 & (cnt >= min_cnt) & (sc >= min_sc)
            vals = (sc, cnt, col(rev_ref[:, :], endv),
                    col(rid_ref[:, :], endv), r_first,
                    col(rpos_ref[:, :], endv), q_first, q_end, sp_first)
            for off, v in enumerate(vals):
                out = jnp.where(keep & (laneK == base + off), v, out)
            if seg_cuts > 0:
                in_slot = (laneK >= base + N_FIXED) & (laneK < base + FLD)
                out = jnp.where(keep & in_slot, cuts, out)

        out_ref[:, :] = out

    return kernel


@partial(jax.jit, static_argnames=("K", "seg_cuts", "min_cnt", "min_sc"))
def backtrack_chains_pallas(anchors, f, p, K, seg_cuts, min_cnt, min_sc):
    """Extract the top-K chains per read on device.

    Returns [B, K, 9 + 2*seg_cuts] int32; unused chain slots are all
    -1 (slot 0's score lane is -1 iff the slot is empty — kept chains
    always have score >= min_sc >= 0).
    """
    B, A = f.shape
    span = anchors.get("span")
    if span is None:
        span = jnp.zeros_like(f)
    FLD = N_FIXED + 2 * seg_cuts
    out = pl.pallas_call(
        _make_kernel(B, A, K, seg_cuts, min_cnt, min_sc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K * FLD), _I32),
        interpret=jax.default_backend() != "tpu",
    )(
        f.astype(_I32),
        p.astype(_I32),
        anchors["valid"].astype(_I32),
        anchors["rev"].astype(_I32),
        anchors["rid"].astype(_I32),
        anchors["rpos"].astype(_I32),
        anchors["qpos"].astype(_I32),
        span.astype(_I32),
    )
    return out.reshape(B, K, FLD)
