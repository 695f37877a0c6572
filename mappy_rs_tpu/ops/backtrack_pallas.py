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

Mosaic notes (the scf.for legalizer rejects [B,1] and i1 loop
carries): the walk's per-read registers live in ONE [B,128] i32 array
updated via column masks — the same pattern as extend_pallas's BST
tracker — so the fori carry is three lane-aligned i32 arrays (used
[B,A], regs [B,128], cuts [B,CPAD]).  Aliveness is encoded as cur=-1
(no lane matches), all lane selects are int compares against [B,1]
indices, and the K passes are unrolled in Python so each pass's output
slot offsets are static.
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
# register columns in the [B, 128] walk-state array:
# 0 cur, 1 alive, 2 cnt, 3 join_f, 4 q_first, 5 r_first, 6 sp_first,
# 7 n_cuts, 8 next_cut
_R_CUR, _R_ALIVE, _R_CNT, _R_JF, _R_QF, _R_RF, _R_SP, _R_NC, _R_NXC = (
    range(9)
)


def _ceil128(n: int) -> int:
    return (n + 127) & ~127


def _make_kernel(B, A, K, seg_cuts, min_cnt, min_sc, CPAD):
    FLD = N_FIXED + 2 * seg_cuts

    def kernel(f_ref, p_ref, valid_ref, rev_ref, rid_ref, rpos_ref,
               qpos_ref, span_ref, out_ref):
        lane = jax.lax.broadcasted_iota(_I32, (B, A), 1)
        laneC = jax.lax.broadcasted_iota(_I32, (B, CPAD), 1)
        colR = jax.lax.broadcasted_iota(_I32, (B, 128), 1)
        f = f_ref[:, :]
        p = p_ref[:, :]
        ok = valid_ref[:, :] != 0

        def col(v, cur):  # v[b, cur[b]] as [B, 1]; cur [B, 1], -1 -> 0
            return jnp.sum(jnp.where(lane == cur, v, 0), axis=1,
                           keepdims=True)

        used = jnp.zeros((B, A), _I32)
        out = jnp.full((B, CPAD), -1, _I32)

        for kk in range(K):  # unrolled: static output slot offsets
            base = kk * FLD
            # best unused candidate end; ties -> larger anchor index
            fc = jnp.where(ok & (f >= min_sc) & (used == 0), f, NEG)
            best = jnp.max(fc, axis=1, keepdims=True)
            endv = jnp.max(jnp.where(fc == best, lane, -1), axis=1,
                           keepdims=True)  # -1 when no candidate
            active0 = (best > NEG).astype(_I32)
            q_end = col(qpos_ref[:, :], endv)

            # regs: cur=endv (already -1 when inactive), alive=active0,
            # next_cut=q_end-SEG_LEN, the rest 0
            regs = jnp.zeros((B, 128), _I32)
            regs = jnp.where(colR == _R_CUR, endv, regs)
            regs = jnp.where(colR == _R_ALIVE, active0, regs)
            regs = jnp.where(colR == _R_NXC, q_end - SEG_LEN, regs)

            def cond(c):
                # early exit once every read's walk is dead: chains are
                # typically tens of anchors, so walking all A iterations
                # wasted ~6x device time (tpu_trials/trial_bt_while.py:
                # 0.18 -> 0.03 ms at B=256/A=512, bit-identical — a
                # dead iteration is a provable no-op)
                i, _used, regs, _cuts = c
                colR_ = jax.lax.broadcasted_iota(_I32, (B, 128), 1)
                n_alive = jnp.sum(jnp.where(colR_ == _R_ALIVE, regs, 0))
                return (i < A) & (n_alive > 0)

            def walk(c):
                i, used, regs, cuts = c
                cur = regs[:, _R_CUR:_R_CUR + 1]  # -1 once finished
                alive = regs[:, _R_ALIVE:_R_ALIVE + 1]
                used = jnp.where(lane == cur, 1, used)
                qp = col(qpos_ref[:, :], cur)
                rp = col(rpos_ref[:, :], cur)
                sp = col(span_ref[:, :], cur)
                live = alive > 0  # [B,1] bool, used on [B,1]s only
                # walk order is end->start: the current anchor is
                # always the earliest seen so far
                q_first = jnp.where(live, qp, regs[:, _R_QF:_R_QF + 1])
                r_first = jnp.where(live, rp, regs[:, _R_RF:_R_RF + 1])
                sp_first = jnp.where(live, sp, regs[:, _R_SP:_R_SP + 1])
                cnt = regs[:, _R_CNT:_R_CNT + 1] + alive
                n_cuts = regs[:, _R_NC:_R_NC + 1]
                next_cut = regs[:, _R_NXC:_R_NXC + 1]
                if seg_cuts > 0:
                    # record a segmentation cut when qpos crosses the
                    # (descending) threshold, capped at seg_cuts
                    do_cut = live & (qp <= next_cut) & (n_cuts < seg_cuts)
                    # -2 slot when not cutting: neither slot nor
                    # slot+1 matches any lane
                    slot = jnp.where(
                        do_cut, base + N_FIXED + 2 * n_cuts, -2)
                    cuts = jnp.where(laneC == slot, qp, cuts)
                    cuts = jnp.where(laneC == slot + 1, rp, cuts)
                    n_cuts = jnp.where(do_cut, n_cuts + 1, n_cuts)
                    next_cut = jnp.where(do_cut, qp - SEG_LEN, next_cut)
                nxt = col(p, cur)
                nxt_used = col(used, nxt) > 0
                joins = live & (nxt >= 0) & nxt_used
                join_f = jnp.where(
                    joins, col(f, nxt), regs[:, _R_JF:_R_JF + 1])
                live2 = live & (nxt >= 0) & (~nxt_used)
                cur = jnp.where(live2, nxt, -1)
                alive = live2.astype(_I32)
                regs = jnp.where(colR == _R_CUR, cur, regs)
                regs = jnp.where(colR == _R_ALIVE, alive, regs)
                regs = jnp.where(colR == _R_CNT, cnt, regs)
                regs = jnp.where(colR == _R_JF, join_f, regs)
                regs = jnp.where(colR == _R_QF, q_first, regs)
                regs = jnp.where(colR == _R_RF, r_first, regs)
                regs = jnp.where(colR == _R_SP, sp_first, regs)
                regs = jnp.where(colR == _R_NC, n_cuts, regs)
                regs = jnp.where(colR == _R_NXC, next_cut, regs)
                return i + 1, used, regs, cuts

            cuts0 = jnp.full((B, CPAD), -1, _I32)
            _, used, regs, cuts = jax.lax.while_loop(
                cond, walk, (jnp.int32(0), used, regs, cuts0))

            sc = col(f, endv) - regs[:, _R_JF:_R_JF + 1]
            cnt = regs[:, _R_CNT:_R_CNT + 1]
            keep = (
                (active0 > 0) & (cnt >= min_cnt) & (sc >= min_sc)
            )  # [B, 1] bool, only compared/selected on [B,1]s below
            vals = (sc, cnt, col(rev_ref[:, :], endv),
                    col(rid_ref[:, :], endv),
                    regs[:, _R_RF:_R_RF + 1],
                    col(rpos_ref[:, :], endv),
                    regs[:, _R_QF:_R_QF + 1], q_end,
                    regs[:, _R_SP:_R_SP + 1])
            for off, v in enumerate(vals):
                # write lane base+off iff keep: -1 target matches none
                tgt = jnp.where(keep, base + off, -1)
                out = jnp.where(laneC == tgt, v, out)
            if seg_cuts > 0:
                lo = jnp.where(keep, base + N_FIXED, CPAD + 1)
                hi = jnp.where(keep, base + FLD, -1)
                out = jnp.where((laneC >= lo) & (laneC < hi), cuts, out)

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
    CPAD = _ceil128(K * FLD)
    # grid over read blocks: the whole-batch formulation holds
    # 8x[B,A]+[B,CPAD] i32 in VMEM at once, which blows the 16MB
    # scoped budget at B=1024/A=256 — 256-row blocks keep ~2.5MB/step
    BLK = 256 if B % 256 == 0 else B
    out = pl.pallas_call(
        _make_kernel(BLK, A, K, seg_cuts, min_cnt, min_sc, CPAD),
        grid=(B // BLK,),
        in_specs=[pl.BlockSpec((BLK, A), lambda i: (i, 0))] * 8,
        out_specs=pl.BlockSpec((BLK, CPAD), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, CPAD), _I32),
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
    return out[:, : K * FLD].reshape(B, K, FLD)
