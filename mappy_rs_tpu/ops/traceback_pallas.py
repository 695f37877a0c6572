"""On-device alignment traceback (Mosaic kernel).

Closes the last device->host gap of the extension stage (SURVEY.md
§2b N10; VERDICT round-1 item #2): instead of downloading the
[S, J, W] direction tensor and walking it on the host, the walk runs
on the TPU and only a packed run-length CIGAR table [J, OPS] plus a
small per-job info row crosses the link (~500B/job vs ~S*W bytes).

Formulation — a BACKWARD anti-diagonal sweep, the mirror image of the
extension kernel's forward sweep:

  * the grid streams the direction tensor in reverse diagonal order
    (BlockSpec index_map s -> NB-1-s), so each grid step holds one
    [DB, J, W] slab in VMEM;
  * every job walks its own path end->start.  A walk step either
    consumes one diagonal (gap move: i or j decrements) or two (match
    move: both decrement), and a state ENTER (H -> E/F) consumes none
    — so per swept diagonal each job needs at most TWO state-machine
    substeps: one that can match/enter, one that can emit a gap op.
    Jobs whose current diagonal is below the sweep simply wait;
  * per-job walk registers (i, j, state, n_ops, current run op/len,
    active, score) are [J, 1] values extracted from / written back to
    a [J, 128] i32 scratch ONCE per grid step;
  * CIGAR runs are emitted in walk order (END->START) into the
    [J, OPS] output via lane-mask writes when a run closes; the final
    run, final (i, j) (for the caller's leading-gap ops) and the
    chosen start score/cell are flushed on the last grid step.

Mosaic constraints honoured (CLAUDE.md): NO boolean-typed VALUES are
ever materialized — every mask is an i32 0/1 array built with
`jnp.where(cmp, 1, 0)` and combined with integer arithmetic;
comparisons appear only as the immediate predicate of a `where`.
(Storing/combining i1 vectors on [J, 1] shapes trips an
"Unsupported target bitwidth for truncation" legalization bug on
this backend's Mosaic.)

The start cell per job replicates models/pipeline's host rule:
  mode 0 (global / mid segment): (qlen-1, tlen-1), score end_sc,
    inactive when the end cell was unreachable in the band;
  mode 1 (extension / flank): last-row best (g_sc, g_j) when
    g_sc + end_bonus >= best_sc (and positive), else the global best
    cell (best_sc, best_i, best_j), inactive when neither is positive.

dirs must be int32 here (the extension kernel stores uint8 for the
host path; sub-word VMEM loads trip the same relayout bug family), so
the device-resident pipeline asks extend_pallas for int32 dirs.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32 = jnp.int32
NEG = -(1 << 28)

DIAG_BLOCK = 8

# register columns in the [J, 128] walk-state scratch
(_R_I, _R_J, _R_ST, _R_NOPS, _R_COP, _R_CLEN, _R_ACT, _R_SC, _R_OVF,
 _R_I0, _R_J0) = range(11)

# CIGAR op codes (BAM): 0=M 1=I 2=D
_OP_M, _OP_I, _OP_D = 0, 1, 2


def _b(cond):
    """i32 0/1 mask from a comparison (never materialize i1 values)."""
    return jnp.where(cond, 1, 0)


def _make_kernel(J: int, W: int, S: int, OPS: int, end_bonus: int,
                 W_log: int = 0):
    # W is the dirs tensor's PHYSICAL lane width; W_log the band width
    # the DP used (lanes >= W_log are 0 in dirs and never addressed:
    # the walk keeps d = i - lo in [0, W_log))
    WL = W_log or W
    NB = (S + DIAG_BLOCK - 1) // DIAG_BLOCK

    def kernel(dirs_ref, best_ref, qlen_ref, tlen_ref, mode_ref,
               ops_ref, info_ref, regs_ref):
        blk = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(_I32, (J, W), 1)
        laneO = jax.lax.broadcasted_iota(_I32, (J, OPS), 1)
        colR = jax.lax.broadcasted_iota(_I32, (J, 128), 1)
        qlen = qlen_ref[:, :1]
        tlen = tlen_ref[:, :1]

        @pl.when(blk == 0)
        def _():
            # start-cell selection (host rule, see module docstring)
            bst = best_ref[:, :]

            def bcol(c):
                return jnp.sum(
                    jnp.where(colR == c, bst, 0), axis=1, keepdims=True
                )

            best_sc = bcol(0)
            best_i = bcol(1)
            best_j = bcol(2)
            g_sc = bcol(3)
            g_j = bcol(4)
            end_sc = bcol(5)
            mode = mode_ref[:, :1]
            # mode 0: global end cell
            g_act = _b(end_sc > NEG // 2)
            # mode 1: extension rule (i32 mask arithmetic)
            use_end = (
                _b(g_sc > NEG // 2)
                * _b(g_sc + end_bonus >= best_sc)
                * _b(g_sc > 0)
            )
            ei = jnp.where(use_end == 1, qlen - 1, best_i)
            ej = jnp.where(use_end == 1, g_j, best_j)
            esc = jnp.where(use_end == 1, g_sc, best_sc)
            e_act = jnp.minimum(use_end + _b(best_sc > 0), 1)
            i0 = jnp.where(mode == 0, qlen - 1, ei)
            j0 = jnp.where(mode == 0, tlen - 1, ej)
            sc0 = jnp.where(mode == 0, end_sc, esc)
            act0 = jnp.where(mode == 0, g_act, e_act)
            regs = jnp.zeros((J, 128), _I32)
            regs = jnp.where(colR == _R_I, i0, regs)
            regs = jnp.where(colR == _R_J, j0, regs)
            regs = jnp.where(colR == _R_ACT, act0, regs)
            regs = jnp.where(colR == _R_SC, sc0, regs)
            regs = jnp.where(colR == _R_COP, -1, regs)
            regs = jnp.where(colR == _R_I0, i0, regs)
            regs = jnp.where(colR == _R_J0, j0, regs)
            regs_ref[:, :] = regs
            ops_ref[:, :] = jnp.full((J, OPS), -1, _I32)
            info_ref[:, :] = jnp.zeros((J, 128), _I32)

        regs = regs_ref[:, :]

        def rcol(c):
            return jnp.sum(
                jnp.where(colR == c, regs, 0), axis=1, keepdims=True
            )

        i = rcol(_R_I)
        jj = rcol(_R_J)
        st = rcol(_R_ST)
        n_ops = rcol(_R_NOPS)
        cur_op = rcol(_R_COP)
        cur_len = rcol(_R_CLEN)
        act = rcol(_R_ACT)
        ovf = rcol(_R_OVF)
        out = ops_ref[:, :]

        def emit(op, mask, n_ops, cur_op, cur_len, out, ovf):
            """Append one `op` to each masked job's run-length stream.
            `mask` is an i32 0/1 [J, 1] array."""
            same = mask * _b(cur_op == op)
            cur_len = jnp.where(same == 1, cur_len + 1, cur_len)
            new_run = mask * (1 - same)
            flush = new_run * _b(cur_len > 0)
            slot = jnp.where(
                (flush == 1) & (n_ops < OPS), n_ops, -1
            )
            out = jnp.where(
                laneO == slot, (cur_len << 4) | cur_op, out
            )
            ovf = jnp.where((flush == 1) & (n_ops >= OPS), 1, ovf)
            n_ops = n_ops + flush
            cur_op = jnp.where(new_run == 1, op, cur_op)
            cur_len = jnp.where(new_run == 1, 1, cur_len)
            return n_ops, cur_op, cur_len, out, ovf

        for k in range(DIAG_BLOCK - 1, -1, -1):
            s = (NB - 1 - blk) * DIAG_BLOCK + k  # descending sweep
            lo = jnp.maximum(s // 2 - WL // 2 + 1, 0)
            drow = dirs_ref[k]  # [J, W] int32

            def read_byte(i_cur):
                d = i_cur - lo
                return jnp.sum(
                    jnp.where(lane == d, drow, 0), axis=1, keepdims=True
                )

            # substep 1: H state — match move or gap-state entry
            act1 = act * _b(i + jj == s) * _b(st == 0)
            byte = read_byte(i)
            src = byte & 7
            is_m = act1 * _b(src == 0)
            n_ops, cur_op, cur_len, out, ovf = emit(
                _OP_M, is_m, n_ops, cur_op, cur_len, out, ovf
            )
            i = jnp.where(is_m == 1, i - 1, i)
            jj = jnp.where(is_m == 1, jj - 1, jj)
            st = jnp.where((act1 == 1) & (src != 0), src, st)

            # substep 2: E/F state — emit one gap op and move
            act2 = act * _b(i + jj == s) * _b(st != 0)
            byte = read_byte(i)
            is_e = act2 * _b(st <= 2) * _b(st >= 1)
            is_f = act2 * _b(st >= 3)
            n_ops, cur_op, cur_len, out, ovf = emit(
                _OP_D, is_e, n_ops, cur_op, cur_len, out, ovf
            )
            n_ops, cur_op, cur_len, out, ovf = emit(
                _OP_I, is_f, n_ops, cur_op, cur_len, out, ovf
            )
            e_bit = jnp.where(st == 1, byte & 8, byte & 16)
            f_bit = jnp.where(st == 3, byte & 32, byte & 64)
            jj = jnp.where(is_e == 1, jj - 1, jj)
            i = jnp.where(is_f == 1, i - 1, i)
            st = jnp.where(
                (is_e == 1) & (e_bit == 0), 0,
                jnp.where((is_f == 1) & (f_bit == 0), 0, st),
            )

            # deactivate walks that ran off the top/left border
            act = jnp.where((i < 0) | (jj < 0), 0, act)

        regs = jnp.where(colR == _R_I, i, regs)
        regs = jnp.where(colR == _R_J, jj, regs)
        regs = jnp.where(colR == _R_ST, st, regs)
        regs = jnp.where(colR == _R_NOPS, n_ops, regs)
        regs = jnp.where(colR == _R_COP, cur_op, regs)
        regs = jnp.where(colR == _R_CLEN, cur_len, regs)
        regs = jnp.where(colR == _R_ACT, act, regs)
        regs = jnp.where(colR == _R_OVF, ovf, regs)
        regs_ref[:, :] = regs
        ops_ref[:, :] = out

        @pl.when(blk == NB - 1)
        def _():
            # flush the open run; export info
            regs2 = regs_ref[:, :]

            def rc(c):
                return jnp.sum(
                    jnp.where(colR == c, regs2, 0), axis=1, keepdims=True
                )

            n_o = rc(_R_NOPS)
            c_op = rc(_R_COP)
            c_len = rc(_R_CLEN)
            o = ops_ref[:, :]
            flush = _b(c_len > 0)
            slot = jnp.where((flush == 1) & (n_o < OPS), n_o, -1)
            o = jnp.where(laneO == slot, (c_len << 4) | c_op, o)
            ovf2 = jnp.where((flush == 1) & (n_o >= OPS), 1, rc(_R_OVF))
            n_o = n_o + flush
            ops_ref[:, :] = o
            # info cols: 0 n_ops, 1 final_i, 2 final_j, 3 score,
            # 4 started, 5 overflow, 6 start_i, 7 start_j
            started = _b(rc(_R_SC) > NEG // 2) * _b(n_o > 0)
            info = jnp.zeros((J, 128), _I32)
            info = jnp.where(colR == 0, n_o, info)
            info = jnp.where(colR == 1, rc(_R_I), info)
            info = jnp.where(colR == 2, rc(_R_J), info)
            info = jnp.where(colR == 3, rc(_R_SC), info)
            info = jnp.where(colR == 4, started, info)
            info = jnp.where(colR == 5, ovf2, info)
            info = jnp.where(colR == 6, rc(_R_I0), info)
            info = jnp.where(colR == 7, rc(_R_J0), info)
            info_ref[:, :] = info

    return kernel


@partial(jax.jit, static_argnames=("W", "OPS", "end_bonus"))
def traceback_pallas(dirs, best, qlen2, tlen2, mode2, W: int, OPS: int,
                     end_bonus: int):
    """Walk the [S, J, W] int32 direction tensor on device.

    qlen2/tlen2/mode2: [J, 128]-broadcast int32 (lane-aligned staging,
    same convention as extend_pallas).  Returns (ops [J, OPS] int32
    packed len<<4|op in END->START order, info [J, 128] int32 — see
    kernel docstring for columns)."""
    S, J, WP = dirs.shape
    assert S % DIAG_BLOCK == 0 and WP >= W
    NB = S // DIAG_BLOCK
    kernel = _make_kernel(J, WP, S, OPS, end_bonus, W_log=W)
    ops, info = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(
                (DIAG_BLOCK, J, WP), lambda b: (NB - 1 - b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((J, OPS), _I32),
            jax.ShapeDtypeStruct((J, 128), _I32),
        ),
        scratch_shapes=[pltpu.VMEM((J, 128), _I32)],
        interpret=jax.default_backend() != "tpu",
    )(dirs, best, qlen2, tlen2, mode2)
    return ops, info
