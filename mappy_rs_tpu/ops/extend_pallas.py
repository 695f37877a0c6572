"""Banded extension DP as a Pallas TPU kernel.

Production path for the hottest kernel (ksw2-class banded dual-affine
DP, SURVEY.md §2b N10).  The XLA scan in ops/extend.py stays as the
CPU/reference implementation; this kernel targets the Mosaic compiler
directly for predictable compile times and speed-of-light VPU
execution.

Key layout decision: Mosaic requires lane-aligned dynamic slices, but
the band slides by one row every other anti-diagonal.  Instead of
in-kernel gathers, the HOST stages the query/target bases in
DIAGONAL-MAJOR order — qd[s, :, d] = q[:, lo(s)+d] and
td[s, :, d] = t[:, s-lo(s)-d] — which is two contiguous numpy slices
per diagonal (C++-speed memcpy, no device gathers at all).  The kernel
then streams one [J, W] slab per grid step through VMEM BlockSpecs
while the five DP state vectors live in VMEM scratch.

Band, scores, direction-byte layout and all tie-breaking match
ops/extend.py exactly; tests assert bit-identical dirs/scores against
it (CPU interpret mode) and against brute force.
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .extend import ExtendParams, band_lo_host

_I32 = jnp.int32
NEG = -(1 << 28)


def stage_diagonals(q: np.ndarray, t: np.ndarray, W: int, S_pad: int = 0):
    """Host prep: [J,Q],[J,T] codes -> diagonal-major int32 [S,J,W] pair.

    Fully vectorized (two sliding-window gathers, C-speed): for each
    anti-diagonal s, lane d holds q[lo(s)+d] and t[s-lo(s)-d], with 4
    (ambiguous) padding outside either sequence.  int32 staging: the
    backend's Mosaic sub-word relayout path is buggy; 4x HBM on the
    staging buffers is cheap."""
    from numpy.lib.stride_tricks import sliding_window_view

    J, Q = q.shape
    T = t.shape[1]
    S = Q + T - 1
    S_out = max(S, S_pad)
    s_arr = np.arange(S, dtype=np.int64)
    lo_arr = np.maximum(s_arr // 2 - W // 2 + 1, 0)

    q_pad = np.full((J, Q + W), 4, np.uint8)
    q_pad[:, :Q] = q
    swv_q = sliding_window_view(q_pad, W, axis=1)  # [J, Q+1, W]
    qd = swv_q[:, np.minimum(lo_arr, Q), :]  # [J, S, W]

    t_pad = np.full((J, T + 2 * W), 4, np.uint8)
    t_pad[:, W : W + T] = t
    rv = t_pad[:, ::-1]
    swv_rv = sliding_window_view(rv, W, axis=1)  # [J, T+W+1, W]
    y0 = np.clip(T + W - 1 - (s_arr - lo_arr), 0, T + W)
    td = swv_rv[:, y0, :]

    qd_out = np.full((S_out, J, W), 4, np.int32)
    td_out = np.full((S_out, J, W), 4, np.int32)
    qd_out[:S] = np.moveaxis(qd, 1, 0)
    td_out[:S] = np.moveaxis(td, 1, 0)
    return qd_out, td_out


DIAG_BLOCK = 8  # anti-diagonals per grid step (amortizes step overhead;
# carries stay in registers across the in-step sub-diagonals)


def _make_kernel(J: int, W: int, S: int, p: ExtendParams,
                 dirs_dtype=jnp.uint8, QP: int = 0, TP: int = 0,
                 W_log: int = 0):
    """DP kernel with IN-KERNEL diagonal staging: the query/target
    windows for the current anti-diagonal live in [J, W] VMEM scratch
    and are maintained as shift registers — one lane roll plus one
    masked-lane injection from the [J, QP]/[J, TP] base arrays per
    diagonal.  (The previous design staged [S, J, W] diagonal-major
    tensors; on-host that upload is ~1MB/job, on-device the XLA
    gathers dominated the kernel runtime.)"""
    # W is the PHYSICAL lane width (multiple of 128 on real TPUs);
    # W_log is the band width the DP semantics use.  Lanes >= W_log are
    # permanently out-of-band (state NEG, dirs 0), so shifted reads
    # across the logical edge see the same sentinel the narrow-band
    # scalar/AVX engines keep — outputs are bit-identical to a
    # physically narrow band.
    WL = W_log or W

    def gap(l):
        return jnp.minimum(p.q + l * p.e, p.q2 + l * p.e2)

    def shift_back(x, lane):  # out[d] = x[d-1]
        return jnp.where(lane == 0, NEG, pltpu.roll(x, shift=1, axis=1))

    def shift_fwd(x, lane):  # out[d] = x[d+1]
        return jnp.where(lane == W - 1, NEG, pltpu.roll(x, shift=W - 1, axis=1))

    def kernel(q_ref, t_ref, qlen_ref, tlen_ref, dirs_ref, best_ref,
               H1, E1, E2, F1, F2, H2, BST, QW, TW):
        blk = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(_I32, (J, W), 1)
        laneQ = jax.lax.broadcasted_iota(_I32, (J, QP), 1)
        laneT = jax.lax.broadcasted_iota(_I32, (J, TP), 1)

        @pl.when(blk == 0)
        def _():
            for ref in (H1, E1, E2, F1, F2, H2):
                ref[:, :] = jnp.full((J, W), NEG, _I32)
            BST[:, :] = jnp.full((J, 128), NEG, _I32)
            # window for s=0: lane d holds q[lo(0)+d] = q[d]; the t
            # window starts empty — the s=0 update injects t[0]
            QW[:, :] = q_ref[:, :W]
            TW[:, :] = jnp.zeros((J, W), _I32)

        qlen = qlen_ref[:, :]  # [J, W] (host-broadcast, avoids i1 relayout)
        tlen = tlen_ref[:, :]
        H1v, E1v, E2v = H1[:, :], E1[:, :], E2[:, :]
        F1v, F2v, H2v = F1[:, :], F2[:, :], H2[:, :]
        bst = BST[:, :]
        qw = QW[:, :]
        tw = TW[:, :]
        col = jax.lax.broadcasted_iota(_I32, (J, 128), 1)

        for k in range(DIAG_BLOCK):
            s = blk * DIAG_BLOCK + k
            # ---- window maintenance: advance (s-1) -> s ----
            lo_s = jnp.maximum(s // 2 - WL // 2 + 1, 0)
            lo_p = jnp.maximum((s - 1) // 2 - WL // 2 + 1, 0)
            qshift = jnp.where(s == 0, 0, lo_s - lo_p)  # 0/1
            tshift = jnp.where(s == 0, 1, 1 - (lo_s - lo_p))

            def inject_col(base_ref, laneB, idx):
                # [J, 1] column base[:, idx] via masked reduction
                return jnp.sum(
                    jnp.where(laneB == idx, base_ref[:, :], 0),
                    axis=1, keepdims=True,
                )

            q_new = pltpu.roll(qw, shift=W - 1, axis=1)  # out[d]=in[d+1]
            q_inj = inject_col(q_ref, laneQ, lo_s + W - 1)
            q_new = jnp.where(lane == W - 1, q_inj, q_new)
            qw = jnp.where(qshift == 1, q_new, qw)
            t_new = pltpu.roll(tw, shift=1, axis=1)  # out[d]=in[d-1]
            t_inj = inject_col(t_ref, laneT, s - lo_s)
            t_new = jnp.where(lane == 0, t_inj, t_new)
            tw = jnp.where(tshift == 1, t_new, tw)
            (H1v, E1v, E2v, F1v, F2v, H2v, bst) = _substep(
                k, s, qw, tw, dirs_ref, qlen, tlen, lane, col,
                H1v, E1v, E2v, F1v, F2v, H2v, bst,
            )

        QW[:, :] = qw
        TW[:, :] = tw
        H1[:, :] = H1v
        E1[:, :] = E1v
        E2[:, :] = E2v
        F1[:, :] = F1v
        F2[:, :] = F2v
        H2[:, :] = H2v
        BST[:, :] = bst

        @pl.when(blk == pl.num_programs(0) - 1)
        def _():
            best_ref[:, :] = bst

    def _substep(k, s, qb, tb, dirs_ref, qlen, tlen, lane, col,
                 H1v, E1v, E2v, F1v, F2v, H2v, bst):
        lo = jnp.maximum(s // 2 - WL // 2 + 1, 0)
        lo1 = jnp.maximum((s - 1) // 2 - WL // 2 + 1, 0)
        lo2 = jnp.maximum((s - 2) // 2 - WL // 2 + 1, 0)
        d1 = lo - lo1  # 0/1
        d2 = lo - lo2  # 0/1/2

        i = lo + lane
        j = s - i
        cell_ok = (
            (i <= jnp.minimum(s, qlen - 1)) & (j >= 0) & (j <= tlen - 1)
            & (lane < WL)
        )

        ambi = (qb == 4) | (tb == 4)
        pair = jnp.where(ambi, -p.sc_ambi, jnp.where(qb == tb, p.a, -p.b))

        # up (i-1, j): d_up = d + d1 - 1
        H_up = jnp.where(d1 == 1, H1v, shift_back(H1v, lane))
        F1_up = jnp.where(d1 == 1, F1v, shift_back(F1v, lane))
        F2_up = jnp.where(d1 == 1, F2v, shift_back(F2v, lane))
        # left (i, j-1): d_left = d + d1
        H_left = jnp.where(d1 == 1, shift_fwd(H1v, lane), H1v)
        E1_left = jnp.where(d1 == 1, shift_fwd(E1v, lane), E1v)
        E2_left = jnp.where(d1 == 1, shift_fwd(E2v, lane), E2v)
        # diag (i-1, j-1): d_diag = d + d2 - 1
        H_diag = jnp.where(
            d2 == 2,
            shift_fwd(H2v, lane),
            jnp.where(d2 == 1, H2v, shift_back(H2v, lane)),
        )

        at_i0 = i == 0
        at_j0 = j == 0
        H_diag = jnp.where(
            at_i0 & at_j0,
            0,
            jnp.where(
                at_i0,
                -gap(j),
                jnp.where(at_j0, -gap(i), H_diag),
            ),
        )
        H_left_b = jnp.where(at_j0, -gap(i + 1), H_left)
        E1_left = jnp.where(at_j0, NEG, E1_left)
        E2_left = jnp.where(at_j0, NEG, E2_left)
        H_up_b = jnp.where(at_i0, -gap(j + 1), H_up)
        F1_up = jnp.where(at_i0, NEG, F1_up)
        F2_up = jnp.where(at_i0, NEG, F2_up)

        e1_open = H_left_b - p.q
        E1n = jnp.maximum(E1_left, e1_open) - p.e
        e1c = jnp.where(E1_left > e1_open, 0x08, 0).astype(jnp.int32)
        e2_open = H_left_b - p.q2
        E2n = jnp.maximum(E2_left, e2_open) - p.e2
        e2c = jnp.where(E2_left > e2_open, 0x10, 0)
        f1_open = H_up_b - p.q
        F1n = jnp.maximum(F1_up, f1_open) - p.e
        f1c = jnp.where(F1_up > f1_open, 0x20, 0)
        f2_open = H_up_b - p.q2
        F2n = jnp.maximum(F2_up, f2_open) - p.e2
        f2c = jnp.where(F2_up > f2_open, 0x40, 0)

        M = H_diag + pair
        H = M
        src = jnp.zeros((J, W), jnp.int32)
        for val, code in ((E1n, 1), (E2n, 2), (F1n, 3), (F2n, 4)):
            better = val > H
            H = jnp.where(better, val, H)
            src = jnp.where(better, code, src)
        H = jnp.where(cell_ok, H, NEG)
        E1w = jnp.where(cell_ok, E1n, NEG)
        E2w = jnp.where(cell_ok, E2n, NEG)
        F1w = jnp.where(cell_ok, F1n, NEG)
        F2w = jnp.where(cell_ok, F2n, NEG)
        dirs_ref[k] = jnp.where(
            cell_ok, src | e1c | e2c | f1c | f2c, 0
        ).astype(dirs_dtype)

        # ---- best trackers (BST cols: 0 best_sc,1 best_i,2 best_j,
        #                                3 g_sc,4 g_j,5 end_sc) -------
        row_best = jnp.max(H, axis=1, keepdims=True)  # [J,1]
        # XLA version uses argmax (first/lowest lane); match it:
        row_arg_first = jnp.min(
            jnp.where(H == row_best, lane, W), axis=1, keepdims=True
        )
        upd = row_best > bst[:, :1]
        best_i = lo + row_arg_first
        new0 = jnp.where(upd, row_best, bst[:, :1])
        new1 = jnp.where(upd, best_i, bst[:, 1:2])
        new2 = jnp.where(upd, s - best_i, bst[:, 2:3])
        lastrow = jnp.where((i == qlen - 1) & cell_ok, H, NEG)
        lr_best = jnp.max(lastrow, axis=1, keepdims=True)
        lr_arg = jnp.min(
            jnp.where(lastrow == lr_best, lane, W), axis=1, keepdims=True
        )
        updg = lr_best > bst[:, 3:4]
        new3 = jnp.where(updg, lr_best, bst[:, 3:4])
        new4 = jnp.where(updg, s - (lo + lr_arg), bst[:, 4:5])
        endmask = jnp.where((i == qlen - 1) & (j == tlen - 1), H, NEG)
        end_here = jnp.max(endmask, axis=1, keepdims=True)
        at_end = s == (qlen[:, :1] + tlen[:, :1] - 2)
        new5 = jnp.where(at_end, jnp.maximum(bst[:, 5:6], end_here), bst[:, 5:6])
        bst = jnp.where(
            col == 0, new0,
            jnp.where(col == 1, new1,
            jnp.where(col == 2, new2,
            jnp.where(col == 3, new3,
            jnp.where(col == 4, new4,
            jnp.where(col == 5, new5, bst))))))
        return (H, E1w, E2w, F1w, F2w, H1v, bst)

    return kernel


def _w_phys(W: int) -> int:
    """Physical lane width for a logical band width W: Mosaic VMEM
    arrays need 128-aligned lane dims on real TPUs; interpret mode
    (CPU tests) runs the exact logical width."""
    if W % 128 == 0 or jax.default_backend() != "tpu":
        return W
    return ((W + 127) // 128) * 128


@partial(jax.jit, static_argnames=("W", "params", "dirs_dtype", "S_pad"))
def _extend_pallas_device(q32, t32, qlen, tlen, W: int,
                          params: ExtendParams, dirs_dtype=jnp.uint8,
                          S_pad: int = 0):
    """q32/t32: [J, QP]/[J, TP] int32 padded base arrays (QP/TP
    multiples of 128, QP >= W_phys); qlen/tlen arrive [J, W_phys].
    Staging happens inside the kernel.  `W` is the LOGICAL band
    width; the dirs output is physical-width (lanes >= W are 0)."""
    J = q32.shape[0]
    WP = _w_phys(W)
    assert S_pad % DIAG_BLOCK == 0
    J2, QP = q32.shape
    TP = t32.shape[1]
    assert J2 == J and QP % 128 == 0 and TP % 128 == 0 and QP >= WP
    assert qlen.shape == (J, WP) and tlen.shape == (J, WP)
    kernel = _make_kernel(J, WP, S_pad, params, dirs_dtype, QP, TP,
                          W_log=W)
    DB = DIAG_BLOCK
    dirs, best = pl.pallas_call(
        kernel,
        grid=(S_pad // DB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((DB, J, WP), lambda s: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S_pad, J, WP), dirs_dtype),
            jax.ShapeDtypeStruct((J, 128), _I32),
        ),
        scratch_shapes=[pltpu.VMEM((J, WP), _I32) for _ in range(6)]
        + [pltpu.VMEM((J, 128), _I32)]
        + [pltpu.VMEM((J, WP), _I32) for _ in range(2)],
        interpret=jax.default_backend() != "tpu",
    )(q32, t32, qlen, tlen)
    return dirs, best


def _pad_lanes(x: np.ndarray, min_w: int) -> np.ndarray:
    """Pad the lane dim to a multiple of 128 (and >= min_w) with 4s —
    the in-kernel staging reads base arrays as full VMEM refs."""
    J, L = x.shape
    target = max(((L + 127) // 128) * 128, ((min_w + 127) // 128) * 128)
    if target == L:
        return x
    out = np.full((J, target), 4, x.dtype)
    out[:, :L] = x
    return out


@partial(
    jax.jit, static_argnames=("W", "OPS", "params", "end_bonus", "S_pad")
)
def _extend_traceback_jit(q, t, qlen, tlen, mode, W, OPS, params,
                          end_bonus, S_pad):
    """Device-resident extension: stage -> banded DP -> traceback.

    The [S, J, W] staging and direction tensors never leave HBM; the
    only outputs are the packed CIGAR table and the per-job info rows
    (~(OPS+128)*4 bytes per job on the wire)."""
    from .traceback_pallas import traceback_pallas

    J, Q = q.shape
    WP = _w_phys(W)
    ql2 = jnp.broadcast_to(qlen.astype(jnp.int32)[:, None], (J, WP))
    tl2 = jnp.broadcast_to(tlen.astype(jnp.int32)[:, None], (J, WP))
    dirs, best = _extend_pallas_device(
        q.astype(jnp.int32), t.astype(jnp.int32), ql2, tl2, W, params,
        dirs_dtype=jnp.int32, S_pad=S_pad,
    )
    ql128 = jnp.broadcast_to(qlen.astype(jnp.int32)[:, None], (J, 128))
    tl128 = jnp.broadcast_to(tlen.astype(jnp.int32)[:, None], (J, 128))
    mode128 = jnp.broadcast_to(mode.astype(jnp.int32)[:, None], (J, 128))
    ops, info = traceback_pallas(
        dirs, best, ql128, tl128, mode128, W, OPS, end_bonus
    )
    return ops, info


def extend_traceback_device(
    q: np.ndarray,  # [J, QMAX] uint8 (host)
    t: np.ndarray,  # [J, TMAX] uint8 (host)
    qlen: np.ndarray,
    tlen: np.ndarray,
    mode: np.ndarray,  # [J] int32: 0 global (mid), 1 extension (flank)
    W: int,
    params: ExtendParams,
    end_bonus: int,
    max_ops: int = 128,
) -> Dict[str, np.ndarray]:
    """Host wrapper for the fully device-resident extension stage.

    Returns dict with `ops` [J, OPS] int32 (len<<4|op, END->START
    order, -1 padded) and `info` [J, 128] int32 (cols: 0 n_ops,
    1 final_i, 2 final_j, 3 score, 4 started, 5 overflow, 6 start_i,
    7 start_j)."""
    q = _pad_lanes(q, _w_phys(W))
    t = _pad_lanes(t, 128)
    S = q.shape[1] + t.shape[1] - 1
    S_pad = ((S + DIAG_BLOCK - 1) // DIAG_BLOCK) * DIAG_BLOCK
    OPS = ((max_ops + 127) // 128) * 128
    ops, info = _extend_traceback_jit(
        jnp.asarray(q), jnp.asarray(t),
        jnp.asarray(qlen.astype(np.int32)),
        jnp.asarray(tlen.astype(np.int32)),
        jnp.asarray(mode.astype(np.int32)),
        W, OPS, params, int(end_bonus), S_pad,
    )
    import jax as _jax

    ops_np, info_np = _jax.device_get((ops, info))
    return {"ops": np.asarray(ops_np), "info": np.asarray(info_np)}


def extend_dp_pallas(
    q: np.ndarray,  # [J, QMAX] uint8 (host)
    t: np.ndarray,  # [J, TMAX] uint8 (host)
    qlen: np.ndarray,
    tlen: np.ndarray,
    W: int,
    params: ExtendParams,
) -> Dict[str, np.ndarray]:
    """Host wrapper: in-kernel staging; same outputs as
    ops/extend.py:extend_dp (dirs/best_sc/best_i/best_j/g_sc/g_j/end_sc)."""
    WP = _w_phys(W)
    q = _pad_lanes(q, WP)
    t = _pad_lanes(t, 128)
    S = q.shape[1] + t.shape[1] - 1
    S_pad = ((S + DIAG_BLOCK - 1) // DIAG_BLOCK) * DIAG_BLOCK
    ql2 = np.broadcast_to(
        qlen.astype(np.int32)[:, None], (len(qlen), WP)
    ).copy()
    tl2 = np.broadcast_to(
        tlen.astype(np.int32)[:, None], (len(tlen), WP)
    ).copy()
    dirs, best = _extend_pallas_device(
        jnp.asarray(q.astype(np.int32)), jnp.asarray(t.astype(np.int32)),
        jnp.asarray(ql2), jnp.asarray(tl2),
        W, params, S_pad=S_pad,
    )
    if WP != W:
        # host walkers infer the band width from the row length:
        # hand them the logical-width tensor
        dirs = dirs[:, :, :W]
    best = np.asarray(best)
    return {
        "dirs": dirs,  # device array [S, J, W]
        "best_sc": best[:, 0],
        "best_i": best[:, 1],
        "best_j": best[:, 2],
        "g_sc": best[:, 3],
        "g_j": best[:, 4],
        "end_sc": best[:, 5],
    }
