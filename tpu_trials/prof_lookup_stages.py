#!/usr/bin/env python
"""Sub-stage profile of collect_anchors on the 32Mbp bench index:
cut the pipeline at successive points, time each partial graph
(pipelined), report deltas.  Fusion shifts work between cuts, so
deltas are indicative, not exact.
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
    from mappy_rs_tpu.models.pipeline import _pow2_at_least
    from mappy_rs_tpu.ops.sketch import sketch_compact
    from mappy_rs_tpu.ops import lookup as lk
    from mappy_rs_tpu.utils.seqcodes import encode

    _I32, _U32 = jnp.int32, jnp.uint32
    rng = np.random.default_rng(0)
    genome = bytes(
        np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, GENOME_LEN)]
    ).decode()
    reads, _ = simulate(rng, genome, 512, READ_LEN, ERROR_RATE)
    al = Aligner(seq=genome, preset="map-ont")
    eng = al._engine
    dev = eng.dev
    k, w = eng.index.k, eng.index.w
    L, B = 1024, 256
    M = max(64, L // max(w // 2, 1))
    A = _pow2_at_least(max(256, int(L * eng.cfg.anchors_per_base)))
    batch = np.full((B, L), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    for bi in range(B):
        c = encode(reads[bi % len(reads)])
        batch[bi, : len(c)] = c
        lens[bi] = len(c)
    cb, lb = jnp.asarray(batch), jnp.asarray(lens)
    qof = float(eng.opt.q_occ_frac)
    print(f"M={M} A={A} bucket_rounds={dev.bucket_rounds} "
          f"bucket_bits={dev.bucket_bits} keys32={dev.keys32} "
          f"n_keys={int(np.asarray(dev.offsets).shape[0])}", flush=True)

    @partial(jax.jit, static_argnames=("stage",))
    def run(cb, lb, stage):
        mins = sketch_compact(cb, lb, k, w, M)
        q_hi, q_lo = mins["key_hi"], mins["key_lo"]
        key_hi, key_lo = dev.key_hi, dev.key_lo
        n_pad = key_lo.shape[0]
        keys32 = dev.keys32
        s = dev.bucket_shift
        if s >= 32:
            b_u = q_hi >> _U32(s - 32)
        elif s == 0:
            b_u = q_lo
        else:
            b_u = (q_lo >> _U32(s)) | (q_hi << _U32(32 - s))
        b = jnp.minimum(
            b_u, _U32((1 << dev.bucket_bits) - 1)
        ).astype(_I32)
        rows_bm = jnp.arange(B, dtype=_I32)[:, None]
        bs2 = dev.bucket_start[b[:, :, None] + jnp.arange(2, dtype=_I32)]
        if stage == 0:
            return bs2
        idx = lk._lower_bound_2key_ranged(
            key_hi, key_lo, q_hi, q_lo,
            bs2[..., 0], bs2[..., 1], dev.bucket_rounds, keys32=keys32,
        )
        if stage == 1:
            return idx
        idx_c = jnp.minimum(idx, n_pad - 1)
        found = (
            (idx < jnp.int32(dev.n_keys))
            & (key_lo[idx_c] == q_lo)
            & (mins["pos"] >= 0)
        )
        if not keys32:
            found &= key_hi[idx_c] == q_hi
        cnt_raw = jnp.where(found, dev.counts[idx_c], 0)
        cnt = jnp.where(cnt_raw > jnp.int32(eng.opt.mid_occ), 0, cnt_raw)
        if stage == 2:
            return cnt
        # q_occ filter (production: qof > 0)
        if qof > 0:
            slot_valid = mins["pos"] >= 0
            pos_iota = jnp.broadcast_to(
                jnp.arange(M, dtype=_I32)[None, :], (B, M))
            vhi = jnp.where(slot_valid, q_hi, _U32(0xFFFFFFFF))
            vlo = jnp.where(slot_valid, q_lo, _U32(0xFFFFFFFF))
            s_hi, s_lo, s_idx = jax.lax.sort(
                (vhi, vlo, pos_iota), dimension=1, num_keys=2)
            first = jnp.concatenate(
                [jnp.ones((B, 1), bool),
                 (s_hi[:, 1:] != s_hi[:, :-1])
                 | (s_lo[:, 1:] != s_lo[:, :-1])], axis=1)
            last = jnp.concatenate(
                [first[:, 1:], jnp.ones((B, 1), bool)], axis=1)
            seg_start = jax.lax.cummax(
                jnp.where(first, pos_iota, 0), axis=1)
            seg_end = jnp.flip(jax.lax.cummin(
                jnp.flip(jnp.where(last, pos_iota + 1, M), axis=1),
                axis=1), axis=1)
            run_len = seg_end - seg_start
            _, q_cnt = jax.lax.sort((s_idx, run_len), dimension=1, num_keys=1)
            n_mins = jnp.sum(slot_valid, axis=1, keepdims=True)
            q_thresh = jnp.maximum(
                (n_mins.astype(jnp.float32) * qof).astype(_I32), 10)
            cnt = jnp.where(q_cnt > q_thresh, 0, cnt)
        if stage == 3:
            return cnt
        off = dev.offsets[idx_c]
        prefix = jnp.concatenate(
            [jnp.zeros((B, 1), _I32),
             jnp.cumsum(cnt, axis=1, dtype=_I32)], axis=1)
        n_anchors = jnp.minimum(prefix[:, -1], A)
        slots = jnp.broadcast_to(jnp.arange(A, dtype=_I32)[None, :], (B, A))
        src = lk._slot_sources(prefix, cnt, A)
        a_valid = slots < n_anchors[:, None]
        if stage == 4:
            return src
        span_col = mins["span"].astype(_I32)
        meta = jnp.stack(
            [prefix[:, :-1], off, mins["pos"],
             mins["strand"].astype(_I32), span_col], axis=-1)
        mrow = meta[rows_bm, src]
        hit_off = slots - mrow[..., 0]
        pos_idx = jnp.where(a_valid, mrow[..., 1] + hit_off, 0)
        if stage == 5:
            return pos_idx
        rid = dev.pos_rid[pos_idx]
        ps = dev.pos_ps[pos_idx]
        if stage == 6:
            return rid, ps
        rpos = (ps >> _U32(1)).astype(_I32)
        rstrand = (ps & _U32(1)).astype(jnp.uint8)
        q_pos = mrow[..., 2]
        q_strand = mrow[..., 3]
        q_span = mrow[..., 4]
        rev = q_strand ^ rstrand.astype(_I32)
        qpos = jnp.where(rev == 0, q_pos,
                         lb[:, None] - (q_pos + 1 - q_span) - 1)
        sort_first = jnp.where(a_valid, rev, 2)
        srt = jax.lax.sort(
            (sort_first, rid, rpos, qpos, a_valid.astype(_I32), q_span),
            dimension=1, num_keys=4)
        return srt

    names = ["bucket dir gather", "ranged bin search", "found+counts",
             "q_occ sort filter", "slot expansion", "meta gather",
             "pos gathers", "anchor sort"]
    prev = 0.0
    for stage in range(8):
        t = bench_call(lambda s=stage: run(cb, lb, s)) * 1e3
        print(f"stage {stage} (+{names[stage]:18s}): {t:6.2f} ms "
              f"(delta {t - prev:+6.2f})", flush=True)
        prev = t


if __name__ == "__main__":
    main()
