#!/usr/bin/env python
"""Decompose the fused front end's device time by stage on the 32Mbp
bench index: sketch | +lookup | +chain | +backtrack, each pipelined.
Each partial graph is a one-off compile (cached thereafter).
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np


def bench_call(fn, nit=10):
    import jax

    jax.block_until_ready(fn())
    t0 = time.time()
    outs = [fn() for _ in range(nit)]
    jax.block_until_ready(outs)
    return (time.time() - t0) / nit


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import simulate, GENOME_LEN, READ_LEN, ERROR_RATE
    from mappy_rs_tpu import Aligner
    from mappy_rs_tpu.models.pipeline import _front_end_bt, _pow2_at_least
    from mappy_rs_tpu.ops.sketch import sketch_compact
    from mappy_rs_tpu.ops.lookup import collect_anchors
    from mappy_rs_tpu.ops.chain_pallas import chain_scores_pallas

    rng = np.random.default_rng(0)
    genome = bytes(
        np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, GENOME_LEN)]
    ).decode()
    reads, _ = simulate(rng, genome, 512, READ_LEN, ERROR_RATE)
    al = Aligner(seq=genome, preset="map-ont")
    eng = al._engine
    from mappy_rs_tpu.utils.seqcodes import encode
    codes = [encode(s) for s in reads]
    k, w = eng.index.k, eng.index.w
    L, B = 1024, 256
    M = max(64, L // max(w // 2, 1))
    A = _pow2_at_least(max(256, int(L * eng.cfg.anchors_per_base)))
    batch = np.full((B, L), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    for bi in range(B):
        c = codes[bi % len(codes)]
        batch[bi, : len(c)] = c
        lens[bi] = len(c)
    dev = eng.dev
    cb = jnp.asarray(batch)
    lb = jnp.asarray(lens)
    cp = eng._chain_params
    qof = float(eng.opt.q_occ_frac)

    @partial(jax.jit, static_argnames=("k", "w", "M"))
    def f_sketch(cb, lb, k, w, M):
        return sketch_compact(cb, lb, k, w, M)

    t = bench_call(lambda: f_sketch(cb, lb, k, w, M))
    print(f"sketch:            {t*1e3:6.1f} ms", flush=True)

    @partial(jax.jit, static_argnames=("k", "w", "M", "A", "qof", "bb", "br", "bs"))
    def f_anchors(cb, lb, k, w, M, A, qof, bb, br, bs):
        mins = sketch_compact(cb, lb, k, w, M)
        return collect_anchors(
            mins, lb, dev.key_hi, dev.key_lo, dev.offsets, dev.counts,
            dev.pos_rid, dev.pos_ps, jnp.int32(dev.n_keys),
            jnp.int32(eng.opt.mid_occ), A, k, qof,
            dev.bucket_start, bb, br, bs,
        )

    args2 = (cb, lb, k, w, M, A, qof, dev.bucket_bits, dev.bucket_rounds,
             dev.bucket_shift)
    t = bench_call(lambda: f_anchors(*args2))
    print(f"sketch+lookup:     {t*1e3:6.1f} ms", flush=True)

    @partial(jax.jit, static_argnames=("k", "w", "M", "A", "qof", "bb", "br", "bs", "pw"))
    def f_chain(cb, lb, k, w, M, A, qof, bb, br, bs, pw):
        mins = sketch_compact(cb, lb, k, w, M)
        anchors = collect_anchors(
            mins, lb, dev.key_hi, dev.key_lo, dev.offsets, dev.counts,
            dev.pos_rid, dev.pos_ps, jnp.int32(dev.n_keys),
            jnp.int32(eng.opt.mid_occ), A, k, qof,
            dev.bucket_start, bb, br, bs,
        )
        return chain_scores_pallas(anchors, cp, pw)

    t = bench_call(lambda: f_chain(*args2, eng.cfg.pallas_chain_window))
    print(f"sketch+lookup+chain:{t*1e3:5.1f} ms", flush=True)

    bt_cuts = min(8, L // eng.SEG_LEN)
    for B2 in (256, 512, 1024):
        batch2 = np.full((B2, L), 4, np.uint8)
        lens2 = np.zeros(B2, np.int32)
        for bi in range(B2):
            c = codes[bi % len(codes)]
            batch2[bi, : len(c)] = c
            lens2[bi] = len(c)
        cb2, lb2 = jnp.asarray(batch2), jnp.asarray(lens2)
        fe_args = (
            cb2, lb2, lb2, None, None, None,
            dev.key_hi, dev.key_lo, dev.offsets, dev.counts,
            dev.pos_rid, dev.pos_ps, dev.bucket_start,
            jnp.int32(dev.n_keys), jnp.int32(eng.opt.mid_occ),
            k, w, M, A, cp, eng.cfg.chain_window, True, qof,
        )

        def run(cb2=cb2, lb2=lb2, fe_args=fe_args):
            return _front_end_bt(
                *fe_args, eng.cfg.backtrack_k, bt_cuts,
                eng.opt.min_cnt, eng.opt.min_chain_score,
                bucket_bits=dev.bucket_bits,
                bucket_rounds=dev.bucket_rounds,
                bucket_shift=dev.bucket_shift,
                pallas_window=eng.cfg.pallas_chain_window,
                keys32=dev.keys32,
            )

        t = bench_call(run)
        print(f"full bt front end  B={B2:5d}: {t*1e3:6.1f} ms "
              f"({B2/t:,.0f} reads/s pipelined)", flush=True)
        # blocking device_get of the compact chain table (the link leg)
        h = run()
        jax.block_until_ready(h)
        t0 = time.time()
        for _ in range(5):
            jax.device_get(h)
        tg = (time.time() - t0) / 5
        nbytes = sum(np.asarray(x).nbytes for x in jax.device_get(h))
        print(f"  device_get: {tg*1e3:6.1f} ms for {nbytes/1e3:.0f} KB",
              flush=True)


if __name__ == "__main__":
    main()
