"""Anchor chaining DP — lock-step windowed recurrence on device.

TPU-native equivalent of the C core's ``mm_chain_dp`` (SURVEY.md §2b
N9).  The reference reaches it through every ``.map()`` call; here a
whole batch of reads runs the recurrence lock-step: one sequential
``lax.scan`` over anchor slots, with the predecessor search over a
static window of H prior anchors vectorized across [B, H] lanes.

Score function matches minimap2's (comput_sc): distance/bandwidth
gates, dg/dd decomposition, linear gap penalty chn_pen_gap*dd and the
0.5*log2(dd+1) term computed with the same float-bit-trick log2
approximation so scores agree integer-for-integer.

Known, documented divergences from the C implementation (both are
heuristic prunings of the same DP):
 - predecessor window is a fixed H (minimap2: up to max_chain_iter=5000
   anchors bounded by max_dist_x); raise H for repeat-dense refs;
 - minimap2's max_chain_skip early-break (a visited-marker heuristic
   that prunes dense regions) is not replicated — this build simply
   scores all H candidates, which can only find equal-or-better chains.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

_I32 = jnp.int32
NEG_INF = jnp.int32(-(1 << 30))


def mg_log2(x: jnp.ndarray) -> jnp.ndarray:
    """minimap2's approximate log2 (float bit trick); x >= 1."""
    z = jax.lax.bitcast_convert_type(x.astype(jnp.float32), _I32)
    log_2 = ((z >> 23) & 255) - 128
    z2 = (z & ~(255 << 23)) + (127 << 23)
    zf = jax.lax.bitcast_convert_type(z2, jnp.float32)
    return log_2.astype(jnp.float32) + (
        (-0.34484843 * zf + 2.02466578) * zf - 0.67487759
    )


class ChainParams(NamedTuple):
    max_dist_x: int  # ref-gap bound (opt.max_gap / max_gap_ref)
    max_dist_y: int  # query-gap bound (opt.max_gap)
    bw: int
    q_span: int
    chn_pen_gap: float
    chn_pen_skip: float


def _pair_scores(ai, aj, p: ChainParams):
    """comput_sc for anchor pairs; ai fields [B,1], aj fields [B,H]."""
    dq = ai["qpos"] - aj["qpos"]
    dr = ai["rpos"] - aj["rpos"]
    same = (ai["rev"] == aj["rev"]) & (ai["rid"] == aj["rid"])
    ok = (
        same
        & aj["valid"]
        & (dq > 0)
        & (dq <= p.max_dist_x)
        & (dq <= p.max_dist_y)
        & (dr != 0)
        & (dr <= p.max_dist_x)
        & (dr > 0)
    )
    dd = jnp.abs(dr - dq)
    ok = ok & (dd <= p.bw)
    dg = jnp.minimum(dr, dq)
    sc = jnp.minimum(dg, p.q_span)
    lin_pen = p.chn_pen_gap * dd.astype(jnp.float32) + p.chn_pen_skip * dg.astype(
        jnp.float32
    )
    log_pen = jnp.where(dd >= 1, mg_log2((dd + 1).astype(jnp.float32)), 0.0)
    pen = (lin_pen + 0.5 * log_pen).astype(_I32)  # C truncation semantics
    sc = jnp.where((dd != 0) | (dg > p.q_span), sc - pen, sc)
    return jnp.where(ok, sc, NEG_INF)


@partial(jax.jit, static_argnames=("window",))
def chain_scores(anchors: dict, params: ChainParams, window: int = 64):
    """Windowed chaining DP over sorted anchors.

    anchors: dict of [B, A] arrays (rev/rid/rpos/qpos/valid) from
    collect_anchors.  Returns f [B, A] (chain score ending at anchor)
    and parent p [B, A] (predecessor slot or -1), minimap2 tie-break
    (largest j wins ties strictly-greater-than q_span).
    """
    rev, rid = anchors["rev"], anchors["rid"]
    rpos, qpos = anchors["rpos"], anchors["qpos"]
    valid = anchors["valid"]
    B, A = rpos.shape
    H = window

    # pad H slots at the front so the window gather is static-shaped
    def pad(x, fill):
        return jnp.concatenate(
            [jnp.full((B, H), fill, x.dtype), x.astype(x.dtype)], axis=1
        )

    prev = {
        "rev": pad(rev, 0),
        "rid": pad(rid, 0),
        "rpos": pad(rpos, 0),
        "qpos": pad(qpos, 0),
        "valid": pad(valid, False),
    }

    q_span = jnp.int32(params.q_span)

    def step(f_pad, i):
        # window of H predecessors: padded slots [i, i+H) = original [i-H, i)
        win = {k: jax.lax.dynamic_slice_in_dim(v, i, H, axis=1) for k, v in prev.items()}
        ai = {
            "rev": jax.lax.dynamic_slice_in_dim(prev["rev"], i + H, 1, axis=1),
            "rid": jax.lax.dynamic_slice_in_dim(prev["rid"], i + H, 1, axis=1),
            "rpos": jax.lax.dynamic_slice_in_dim(prev["rpos"], i + H, 1, axis=1),
            "qpos": jax.lax.dynamic_slice_in_dim(prev["qpos"], i + H, 1, axis=1),
            "valid": jax.lax.dynamic_slice_in_dim(prev["valid"], i + H, 1, axis=1),
        }
        sc = _pair_scores(ai, win, params)  # [B, H]
        f_win = jax.lax.dynamic_slice_in_dim(f_pad, i, H, axis=1)
        tot = jnp.where(sc > NEG_INF, f_win + sc, NEG_INF)
        best = jnp.max(tot, axis=1)
        # largest-j tie-break: scan reversed, argmax picks first max
        arg = (H - 1) - jnp.argmax(tot[:, ::-1], axis=1)
        take = best > q_span  # strict: minimap2's `sc > max_f` vs init
        f_i = jnp.where(take, best, q_span)
        f_i = jnp.where(ai["valid"][:, 0], f_i, NEG_INF)
        p_i = jnp.where(take & ai["valid"][:, 0], i - H + arg, -1)
        f_pad = jax.lax.dynamic_update_slice_in_dim(
            f_pad, f_i[:, None], i + H, axis=1
        )
        return f_pad, (f_i, p_i)

    f_pad0 = jnp.full((B, A + H), NEG_INF, _I32)
    _, (f_t, p_t) = jax.lax.scan(step, f_pad0, jnp.arange(A, dtype=_I32))
    f = jnp.transpose(f_t)  # [B, A]
    p = jnp.transpose(p_t)
    return f, p
