#!/usr/bin/env python
"""Profile the device front end on TPU: steady-state per-batch cost of
dispatch (device compute), download, host backtrack, extension, finalize.

Run: python tpu_trials/prof_front_end.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import simulate, GENOME_LEN, READ_LEN, ERROR_RATE

    from mappy_rs_tpu import Aligner, native
    from mappy_rs_tpu.utils.seqcodes import encode

    rng = np.random.default_rng(0)
    genome = "".join(rng.choice(list("ACGT"), size=GENOME_LEN))
    reads, truth = simulate(rng, genome, 1024, READ_LEN, ERROR_RATE)
    al = Aligner(seq=genome, preset="map-ont")
    eng = al._engine
    codes = [encode(s) for s in reads]
    out = [[] for _ in reads]

    # warm up every shape (full batch of 256)
    t0 = time.time()
    eng.map_batch(reads[:512])
    print(f"warmup 512 reads: {time.time()-t0:.2f}s", flush=True)

    # steady state full map_batch, single caller thread
    for trial in range(2):
        eng.metrics.reset() if hasattr(eng.metrics, "reset") else None
        t0 = time.time()
        eng.map_batch(reads)
        dt = time.time() - t0
        print(f"single-thread map_batch 1024 reads: {dt:.2f}s "
              f"({1024/dt:.0f} r/s)", flush=True)
    m = dict(eng.metrics.snapshot()) if hasattr(eng.metrics, "snapshot") else {}
    for key in sorted(k for k in m if k.startswith("time_")):
        print(f"  {key}: {m[key]:.3f}")

    # ---- micro: isolate the fused front-end call for B=256, L=1024 ----
    import jax.numpy as jnp
    L = 1024
    B = 256
    idxs = [i for i, c in enumerate(codes) if len(c) <= L][:B]
    batch = np.full((B, L), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    for bi, ri in enumerate(idxs):
        c = codes[ri]
        batch[bi, : len(c)] = c
        lens[bi] = len(c)
    k, w = eng.index.k, eng.index.w
    M = max(64, L // max(w // 2, 1))
    from mappy_rs_tpu.models.pipeline import _front_end, _pow2_at_least
    A = _pow2_at_least(max(256, int(L * eng.cfg.anchors_per_base)))
    fe_args = (
        jnp.asarray(batch), jnp.asarray(lens), jnp.asarray(lens),
        None, None, None,
        eng.dev.key_hi, eng.dev.key_lo, eng.dev.offsets, eng.dev.counts,
        eng.dev.pos_rid, eng.dev.pos_ps, eng.dev.bucket_start,
        jnp.int32(eng.dev.n_keys), jnp.int32(eng.opt.mid_occ),
        k, w, M, A, eng._chain_params, eng.cfg.chain_window,
        jax.default_backend() == "tpu", float(eng.opt.q_occ_frac),
        eng.dev.bucket_bits, eng.dev.bucket_rounds, eng.dev.bucket_shift,
    )
    pw = eng.cfg.pallas_chain_window
    # warm
    stacked, n_dev = _front_end(*fe_args, pallas_window=pw)
    jax.block_until_ready((stacked, n_dev))
    # device compute only
    NIT = 20
    t0 = time.time()
    for _ in range(NIT):
        stacked, n_dev = _front_end(*fe_args, pallas_window=pw)
        jax.block_until_ready((stacked, n_dev))
    t_disp = (time.time() - t0) / NIT
    print(f"front_end dispatch+compute (B={B},L={L},A={A}): "
          f"{t_disp*1e3:.1f} ms/batch -> {B/t_disp:.0f} r/s", flush=True)
    # download cost (first-128 slots pipelined fetch, like _front_end_full)
    t0 = time.time()
    for _ in range(NIT):
        stacked, n_dev = _front_end(*fe_args, pallas_window=pw)
        arr, n2 = jax.device_get((stacked[:, :, :128], n_dev))
    t_full = (time.time() - t0) / NIT
    print(f"  +download[:,:,:128]: {t_full*1e3:.1f} ms/batch "
          f"({(t_full-t_disp)*1e3:.1f} ms xfer) -> {B/t_full:.0f} r/s",
          flush=True)
    # host backtrack
    arr = np.asarray(arr)
    t0 = time.time()
    for _ in range(NIT):
        chains_np = native.backtrack_compact_batch(
            arr, eng.opt.min_cnt, eng.opt.min_chain_score,
            eng.cfg.backtrack_k, min(8, L // eng.SEG_LEN), eng.SEG_LEN,
        )
    t_bt = (time.time() - t0) / NIT
    print(f"  host C++ backtrack: {t_bt*1e3:.1f} ms/batch", flush=True)

    # device-side backtrack variant
    from mappy_rs_tpu.models.pipeline import _front_end_bt
    try:
        ch, rl = _front_end_bt(
            *fe_args[:23], eng.cfg.backtrack_k, min(8, L // eng.SEG_LEN),
            eng.opt.min_cnt, eng.opt.min_chain_score,
            bucket_bits=fe_args[23], bucket_rounds=fe_args[24],
            bucket_shift=fe_args[25], pallas_window=pw,
        )
        jax.block_until_ready((ch, rl))
        t0 = time.time()
        for _ in range(NIT):
            ch, rl = _front_end_bt(
                *fe_args[:23], eng.cfg.backtrack_k, min(8, L // eng.SEG_LEN),
                eng.opt.min_cnt, eng.opt.min_chain_score,
                bucket_bits=fe_args[23], bucket_rounds=fe_args[24],
                bucket_shift=fe_args[25], pallas_window=pw,
            )
            c_np, r_np = jax.device_get((ch, rl))
        t_btd = (time.time() - t0) / NIT
        print(f"device-backtrack front_end total: {t_btd*1e3:.1f} ms/batch "
              f"-> {B/t_btd:.0f} r/s", flush=True)
    except Exception as e:
        print("device-bt failed:", repr(e)[:200], flush=True)


if __name__ == "__main__":
    main()
