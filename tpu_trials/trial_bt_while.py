#!/usr/bin/env python
"""Early-exit walk for the backtrack kernel: chains are typically tens
of anchors, but the kernel's fori_loop walks all A (=512) iterations
per pass x K passes.  A while_loop whose condition is "any read still
alive" would cut iterations ~10x IF Mosaic legalizes a scalar-condition
while with vector carries.  This measures both variants and checks
bit-identity on realistic chain structures.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import mappy_rs_tpu.ops.backtrack_pallas as btp

    B, A, K, CUTS = 256, 512, 8, 4
    rng = np.random.default_rng(0)
    # realistic structure: per read, a few chains of geometric length
    f = np.zeros((B, A), np.int32)
    p = np.full((B, A), -1, np.int32)
    valid = np.zeros((B, A), np.int32)
    for b in range(B):
        pos = 0
        while pos < A - 4:
            ln = min(int(rng.geometric(0.04)), A - pos - 1)  # mean 25
            sc = 0
            for i in range(ln):
                sc += int(rng.integers(10, 20))
                f[b, pos + i] = sc
                p[b, pos + i] = pos + i - 1 if i else -1
                valid[b, pos + i] = 1
            pos += ln + int(rng.integers(1, 4))
    rev = rng.integers(0, 2, (B, A)).astype(np.int32)
    rid = rng.integers(0, 5, (B, A)).astype(np.int32)
    rpos = np.cumsum(rng.integers(1, 50, (B, A)), axis=1).astype(np.int32)
    qpos = np.cumsum(rng.integers(1, 20, (B, A)), axis=1).astype(np.int32)

    anchors = {
        "valid": jnp.asarray(valid).astype(bool),
        "rev": jnp.asarray(rev),
        "rid": jnp.asarray(rid),
        "rpos": jnp.asarray(rpos),
        "qpos": jnp.asarray(qpos),
        "span": jnp.asarray(np.full((B, A), 15, np.int32)),
    }
    fj, pj = jnp.asarray(f), jnp.asarray(p)

    # vary inputs per timed call: identical (executable, args) repeats
    # can be served from caches on this backend and time as ~0
    fjs = [jnp.asarray(f + (i % 7)) for i in range(8)]

    def run_fori(i=0):
        return btp.backtrack_chains_pallas(
            anchors, fjs[i % 8], pj, K, CUTS, 3, 40)

    t0 = time.time()
    out0 = jax.block_until_ready(run_fori())
    print(f"fori first call {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    outs = [run_fori(i) for i in range(20)]
    jax.block_until_ready(outs)
    print(f"fori: {(time.time() - t0) / 20 * 1e3:.2f} ms", flush=True)

    # patch in the while variant
    btp_while = btp.backtrack_chains_pallas.__wrapped__  # un-jitted
    orig_make = btp._make_kernel
    import types

    def make_kernel_while(B, A, K, seg_cuts, min_cnt, min_sc, CPAD):
        FLD = btp.N_FIXED + 2 * seg_cuts
        _I32 = jnp.int32
        NEG = btp.NEG
        SEG_LEN = btp.SEG_LEN
        (_R_CUR, _R_ALIVE, _R_CNT, _R_JF, _R_QF, _R_RF, _R_SP, _R_NC,
         _R_NXC) = range(9)

        def kernel(f_ref, p_ref, valid_ref, rev_ref, rid_ref, rpos_ref,
                   qpos_ref, span_ref, out_ref):
            lane = jax.lax.broadcasted_iota(_I32, (B, A), 1)
            laneC = jax.lax.broadcasted_iota(_I32, (B, CPAD), 1)
            colR = jax.lax.broadcasted_iota(_I32, (B, 128), 1)
            f = f_ref[:, :]
            p = p_ref[:, :]
            ok = valid_ref[:, :] != 0

            def col(v, cur):
                return jnp.sum(jnp.where(lane == cur, v, 0), axis=1,
                               keepdims=True)

            used = jnp.zeros((B, A), _I32)
            out = jnp.full((B, CPAD), -1, _I32)

            for kk in range(K):
                base = kk * FLD
                fc = jnp.where(ok & (f >= min_sc) & (used == 0), f, NEG)
                best = jnp.max(fc, axis=1, keepdims=True)
                endv = jnp.max(jnp.where(fc == best, lane, -1), axis=1,
                               keepdims=True)
                active0 = (best > NEG).astype(_I32)
                q_end = col(qpos_ref[:, :], endv)

                regs = jnp.zeros((B, 128), _I32)
                regs = jnp.where(colR == _R_CUR, endv, regs)
                regs = jnp.where(colR == _R_ALIVE, active0, regs)
                regs = jnp.where(colR == _R_NXC, q_end - SEG_LEN, regs)

                def cond(c):
                    i, used, regs, cuts = c
                    n_alive = jnp.sum(
                        jnp.where(colR == _R_ALIVE, regs, 0))
                    return (i < A) & (n_alive > 0)

                def walk(c):
                    i, used, regs, cuts = c
                    cur = regs[:, _R_CUR:_R_CUR + 1]
                    alive = regs[:, _R_ALIVE:_R_ALIVE + 1]
                    used = jnp.where(lane == cur, 1, used)
                    qp = col(qpos_ref[:, :], cur)
                    rp = col(rpos_ref[:, :], cur)
                    sp = col(span_ref[:, :], cur)
                    live = alive > 0
                    q_first = jnp.where(live, qp, regs[:, _R_QF:_R_QF + 1])
                    r_first = jnp.where(live, rp, regs[:, _R_RF:_R_RF + 1])
                    sp_first = jnp.where(live, sp, regs[:, _R_SP:_R_SP + 1])
                    cnt = regs[:, _R_CNT:_R_CNT + 1] + alive
                    n_cuts = regs[:, _R_NC:_R_NC + 1]
                    next_cut = regs[:, _R_NXC:_R_NXC + 1]
                    cuts2 = cuts
                    if seg_cuts > 0:
                        do_cut = live & (qp <= next_cut) & (n_cuts < seg_cuts)
                        slot = jnp.where(
                            do_cut, base + btp.N_FIXED + 2 * n_cuts, -2)
                        cuts2 = jnp.where(laneC == slot, qp, cuts2)
                        cuts2 = jnp.where(laneC == slot + 1, rp, cuts2)
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
                    return i + 1, used, regs, cuts2

                cuts0 = jnp.full((B, CPAD), -1, _I32)
                _, used, regs, cuts = jax.lax.while_loop(
                    cond, walk, (jnp.int32(0), used, regs, cuts0))

                sc = col(f, endv) - regs[:, _R_JF:_R_JF + 1]
                cnt = regs[:, _R_CNT:_R_CNT + 1]
                keep = ((active0 > 0) & (cnt >= min_cnt) & (sc >= min_sc))
                vals = (sc, cnt, col(rev_ref[:, :], endv),
                        col(rid_ref[:, :], endv),
                        regs[:, _R_RF:_R_RF + 1],
                        col(rpos_ref[:, :], endv),
                        regs[:, _R_QF:_R_QF + 1], q_end,
                        regs[:, _R_SP:_R_SP + 1])
                for off, v in enumerate(vals):
                    tgt = jnp.where(keep, base + off, -1)
                    out = jnp.where(laneC == tgt, v, out)
                if seg_cuts > 0:
                    lo = jnp.where(keep, base + btp.N_FIXED, CPAD + 1)
                    hi = jnp.where(keep, base + FLD, -1)
                    out = jnp.where((laneC >= lo) & (laneC < hi), cuts, out)

            out_ref[:, :] = out

        return kernel

    btp._make_kernel = make_kernel_while
    from functools import partial

    run_while_jit = partial(
        jax.jit, static_argnames=("K", "seg_cuts", "min_cnt", "min_sc")
    )(btp_while)

    def run_while(i=0):
        return run_while_jit(anchors, fjs[i % 8], pj, K=K, seg_cuts=CUTS,
                             min_cnt=3, min_sc=40)

    t0 = time.time()
    out1 = jax.block_until_ready(run_while())
    print(f"while first call {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    outs = [run_while(i) for i in range(20)]
    jax.block_until_ready(outs)
    print(f"while: {(time.time() - t0) / 20 * 1e3:.2f} ms", flush=True)
    btp._make_kernel = orig_make

    same = bool(np.array_equal(np.asarray(out0), np.asarray(out1)))
    print("bit-identical:", same)
    if not same:
        d = np.argwhere(np.asarray(out0) != np.asarray(out1))
        print("first diffs:", d[:5])


if __name__ == "__main__":
    main()
