#!/usr/bin/env python
"""Distinguish tunnel round-trip latency from device compute: time the
fused front end (a) serialized (block every call) vs (b) pipelined
(enqueue N, block once), and (c) at B=512/1024.  Also time the device
extension kernel per batch to size a fully-device-resident pipeline.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def bench_call(fn, nit=20, pipelined=False):
    import jax

    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    if pipelined:
        outs = [fn() for _ in range(nit)]
        jax.block_until_ready(outs)
    else:
        for _ in range(nit):
            jax.block_until_ready(fn())
    return (time.time() - t0) / nit


def main():
    import jax

    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import simulate, GENOME_LEN, READ_LEN, ERROR_RATE
    from mappy_rs_tpu import Aligner
    from mappy_rs_tpu.models.pipeline import _front_end, _front_end_bt, _pow2_at_least
    from mappy_rs_tpu.utils.seqcodes import encode

    rng = np.random.default_rng(0)
    genome = "".join(rng.choice(list("ACGT"), size=GENOME_LEN))
    reads, _ = simulate(rng, genome, 1024, READ_LEN, ERROR_RATE)
    al = Aligner(seq=genome, preset="map-ont")
    eng = al._engine
    codes = [encode(s) for s in reads]
    k, w = eng.index.k, eng.index.w
    L = 1024
    pw = eng.cfg.pallas_chain_window

    def make_args(B):
        batch = np.full((B, L), 4, np.uint8)
        lens = np.zeros(B, np.int32)
        for bi in range(B):
            c = codes[bi % len(codes)]
            batch[bi, : len(c)] = c
            lens[bi] = len(c)
        M = max(64, L // max(w // 2, 1))
        A = _pow2_at_least(max(256, int(L * eng.cfg.anchors_per_base)))
        return (
            jnp.asarray(batch), jnp.asarray(lens), jnp.asarray(lens),
            None, None, None,
            eng.dev.key_hi, eng.dev.key_lo, eng.dev.offsets, eng.dev.counts,
            eng.dev.pos_rid, eng.dev.pos_ps, eng.dev.bucket_start,
            jnp.int32(eng.dev.n_keys), jnp.int32(eng.opt.mid_occ),
            k, w, M, A, eng._chain_params, eng.cfg.chain_window,
            jax.default_backend() == "tpu", float(eng.opt.q_occ_frac),
            eng.dev.bucket_bits, eng.dev.bucket_rounds, eng.dev.bucket_shift,
        )

    for B in (256, 512, 1024):
        fe_args = make_args(B)
        t_ser = bench_call(
            lambda: _front_end(*fe_args, pallas_window=pw), 10, False
        )
        t_pip = bench_call(
            lambda: _front_end(*fe_args, pallas_window=pw), 10, True
        )
        print(f"B={B}: serialized {t_ser*1e3:.1f} ms ({B/t_ser:.0f} r/s) | "
              f"pipelined {t_pip*1e3:.1f} ms ({B/t_pip:.0f} r/s)",
              flush=True)
        bt_cuts = min(8, L // eng.SEG_LEN)
        t_bt = bench_call(
            lambda: _front_end_bt(
                *fe_args[:23], eng.cfg.backtrack_k, bt_cuts,
                eng.opt.min_cnt, eng.opt.min_chain_score,
                bucket_bits=fe_args[23], bucket_rounds=fe_args[24],
                bucket_shift=fe_args[25], pallas_window=pw,
            ), 10, True,
        )
        print(f"  bt-variant pipelined {t_bt*1e3:.1f} ms ({B/t_bt:.0f} r/s)",
              flush=True)

    # --- device extension kernel cost per batch ---
    # typical job shape after chaining for 1kb reads: mid segments
    # ~SEG_LEN query, band W. Use the engine's own device path sizes.
    from mappy_rs_tpu.ops.extend_pallas import extend_pallas
    from mappy_rs_tpu.ops.extend import ExtendParams
    P = ExtendParams(*[int(x) for x in eng._ext_params_tuple]) if hasattr(
        eng, "_ext_params_tuple") else None
    if P is None:
        o = eng.opt
        P = ExtendParams(o.a, o.b, o.q, o.e, o.q2, o.e2, o.zdrop)
    for (J, QP, TP, W) in ((256, 512, 640, 128), (512, 512, 640, 128)):
        q = np.random.default_rng(1).integers(0, 4, (J, QP)).astype(np.uint8)
        t = np.random.default_rng(2).integers(0, 4, (J, TP)).astype(np.uint8)
        ql = np.full(J, QP - 32, np.int32)
        tl = np.full(J, TP - 32, np.int32)
        try:
            tm = bench_call(
                lambda: extend_pallas(
                    jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql),
                    jnp.asarray(tl), QP, TP, W, P,
                ), 5, True,
            )
            cells = float(J) * (QP - 32) * (2 * W)
            print(f"extend_pallas J={J} {QP}x{TP} W={W}: {tm*1e3:.1f} ms "
                  f"({cells/tm/1e9:.1f} Gcells/s)", flush=True)
        except Exception as e:
            print("extend_pallas fail:", repr(e)[:300], flush=True)
            break


if __name__ == "__main__":
    main()
