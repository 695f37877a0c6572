"""Chaining DP as a Pallas TPU kernel.

The XLA formulations (ops/chain.py) are kept as CPU/reference
implementations; on TPU the backend's XLA compiler exhibits
super-linear compile blowups on chained rank-3 reductions inside
scans, so the production chain kernel is hand-written for the Mosaic
compiler instead.

Mosaic-native formulation (respecting the (8,128) tiling rules — all
dynamic VMEM slices are 128-aligned):

  grid = one step per 128-anchor block (sequential on core);
  the block's predecessor window is the previous block + the block
  itself, read as lane-aligned [B, 2C] vectors;
  an inner fori walks the 128 anchors: the current anchor's fields are
  extracted with a masked lane-reduction (no unaligned gather), the
  [B, 2C] candidate scores are evaluated on the VPU, and the running
  f/p vectors are updated with a lane-mask select (no unaligned
  store).  The f array persists across blocks in a VMEM scratch.

Window semantics: predecessors are the H=128 anchors preceding each
anchor (exactly chain_scores' fixed-H window with H=128).  Scores are
identical to ops/chain.py:_pair_scores (same gates, same bit-trick
log2, same truncation); minimap2's largest-j tie-break.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .chain import ChainParams

_I32 = jnp.int32
NEG_INF = -(1 << 30)
C = 128  # anchor block width == predecessor window (lane-aligned)


def _mg_log2_f32(x):
    z = pltpu.bitcast(x, jnp.int32)
    log_2 = ((z >> 23) & 255) - 128
    z2 = (z & ~(255 << 23)) + (127 << 23)
    zf = pltpu.bitcast(z2, jnp.float32)
    return log_2.astype(jnp.float32) + (
        (-0.34484843 * zf + 2.02466578) * zf - 0.67487759
    )


def _make_kernel(B: int, params: ChainParams, R: int = 1):
    """R = history blocks: the predecessor window is R*128 anchors
    (minimap2's max_chain_iter analogue; R=1 == the round-1 kernel)."""
    p = params
    q_span = p.q_span
    WIN = (R + 1) * C  # R history blocks + the current block

    def kernel(rev_ref, rid_ref, rpos_ref, qpos_ref, valid_ref, span_ref,
               f_out, p_out, f_scr):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            f_scr[:, :] = jnp.full((B, R * C), NEG_INF, _I32)

        start = pl.multiple_of(b * C, C)  # padded window start
        win = {
            "rev": rev_ref[:, pl.ds(start, WIN)],
            "rid": rid_ref[:, pl.ds(start, WIN)],
            "rpos": rpos_ref[:, pl.ds(start, WIN)],
            "qpos": qpos_ref[:, pl.ds(start, WIN)],
            "valid": valid_ref[:, pl.ds(start, WIN)],
            "span": span_ref[:, pl.ds(start, WIN)],
        }
        f_prev = f_scr[:, :]  # [B, R*C] final scores of prior blocks
        lane2 = jax.lax.broadcasted_iota(_I32, (B, WIN), 1)
        lane1 = jax.lax.broadcasted_iota(_I32, (B, C), 1)
        anchor_base = b * C - R * C  # absolute index of window lane 0

        def body(i, carry):
            f_cur, p_cur = carry  # [B, C] each

            def col(v):  # current anchor's field, [B, 1]
                return jnp.sum(
                    jnp.where(lane2 == R * C + i, v, 0), axis=1,
                    keepdims=True,
                )

            cq = col(win["qpos"])
            cr = col(win["rpos"])
            c_rev = col(win["rev"])
            c_rid = col(win["rid"])
            c_val = col(win["valid"])
            c_span = col(win["span"])

            dq = cq - win["qpos"]
            dr = cr - win["rpos"]
            ok = (
                (c_rev == win["rev"])
                & (c_rid == win["rid"])
                & (win["valid"] > 0)
                & (c_val > 0)
                & (dq > 0)
                & (dq <= p.max_dist_x)
                & (dq <= p.max_dist_y)
                & (dr > 0)
                & (dr <= p.max_dist_x)
            )
            dd = jnp.abs(dr - dq)
            ok = ok & (dd <= p.bw)
            # predecessor lanes: [i, R*C+i) == anchors [abs_i-R*C, abs_i)
            ok = ok & (lane2 >= i) & (lane2 < R * C + i)
            dg = jnp.minimum(dr, dq)
            w_span = win["span"]  # predecessor's span caps the gain
            sc = jnp.minimum(dg, w_span)
            lin_pen = p.chn_pen_gap * dd.astype(jnp.float32) + (
                p.chn_pen_skip * dg.astype(jnp.float32)
            )
            log_pen = jnp.where(
                dd >= 1, _mg_log2_f32((dd + 1).astype(jnp.float32)), 0.0
            )
            pen = (lin_pen + 0.5 * log_pen).astype(_I32)
            if p.is_splice:  # params are static here: python branch
                pen = jnp.where(
                    dr > dq,  # candidate intron: log-cost ref gap
                    jnp.minimum(lin_pen, log_pen).astype(_I32),
                    pen,
                )
            sc = jnp.where((dd != 0) | (dg > w_span), sc - pen, sc)
            sc = jnp.where(ok, sc, NEG_INF)

            f_win = jnp.concatenate([f_prev, f_cur], axis=1)  # [B, WIN]
            tot = jnp.where(sc > NEG_INF, f_win + sc, NEG_INF)
            best = jnp.max(tot, axis=1, keepdims=True)  # [B, 1]
            arg = jnp.max(
                jnp.where(tot == best, lane2, -1), axis=1, keepdims=True
            )  # largest-j tie break (lane order == anchor order)
            take = best > c_span
            f_i = jnp.where(take, best, c_span)
            f_i = jnp.where(c_val > 0, f_i, NEG_INF)
            p_i = jnp.where(take & (c_val > 0), anchor_base + arg, -1)
            upd = lane1 == i
            f_cur = jnp.where(upd, f_i, f_cur)
            p_cur = jnp.where(upd, p_i, p_cur)
            return f_cur, p_cur

        f_cur0 = jnp.full((B, C), NEG_INF, _I32)
        p_cur0 = jnp.full((B, C), -1, _I32)
        f_cur, p_cur = jax.lax.fori_loop(0, C, body, (f_cur0, p_cur0))
        if R == 1:
            f_scr[:, :] = f_cur
        else:
            # shift the history ring left one block
            f_scr[:, :] = jnp.concatenate(
                [f_prev[:, C:], f_cur], axis=1
            )
        f_out[:, pl.ds(pl.multiple_of(b * C, C), C)] = f_cur
        p_out[:, pl.ds(pl.multiple_of(b * C, C), C)] = p_cur

    return kernel


@partial(jax.jit, static_argnames=("params", "window"))
def chain_scores_pallas(anchors: dict, params: ChainParams, window: int = C):
    """Pallas chain DP.  The predecessor window is
    ceil(window/128)*128 anchors (lane-aligned multi-block history —
    minimap2's max_chain_iter analogue; cost grows linearly with the
    window)."""
    R = max(1, (window + C - 1) // C)
    rev = anchors["rev"].astype(_I32)
    rid = anchors["rid"].astype(_I32)
    rpos = anchors["rpos"].astype(_I32)
    qpos = anchors["qpos"].astype(_I32)
    valid = anchors["valid"].astype(_I32)
    span = anchors.get("span")
    if span is None:
        span = jnp.full_like(rpos, params.q_span)
    span = span.astype(_I32)
    B, A = rpos.shape
    NB = (A + C - 1) // C
    A_pad = NB * C

    def pad(x, fill):
        return jnp.concatenate(
            [
                jnp.full((B, R * C), fill, x.dtype),
                x,
                jnp.full((B, A_pad - A), fill, x.dtype),
            ],
            axis=1,
        )

    args = (
        pad(rev, 0), pad(rid, 0), pad(rpos, 0), pad(qpos, 0),
        pad(valid, 0), pad(span, 0),
    )
    kernel = _make_kernel(B, params, R)
    f, p = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, A_pad), _I32),
            jax.ShapeDtypeStruct((B, A_pad), _I32),
        ),
        scratch_shapes=[pltpu.VMEM((B, R * C), _I32)],
        interpret=jax.default_backend() != "tpu",
    )(*args)
    f = f[:, :A]
    p = p[:, :A]
    f = jnp.where(anchors["valid"], f, NEG_INF)
    p = jnp.where(anchors["valid"] & (p < A), p, -1)
    return f, p
