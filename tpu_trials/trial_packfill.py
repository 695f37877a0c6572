#!/usr/bin/env python
"""Packed scatter+cummax forward-fill vs the [B,A,5] meta row-gather.

src (anchor slot -> minimizer slot) is NON-DECREASING per row, so any
per-minimizer field can be expanded to anchor slots without a gather:
scatter (m << FB) | field at the minimizer's start slot, cummax
forward-fills (monotone via m in the high bits), mask out m.  Three
packed arrays + one plain start-slot fill replace the row-gather AND
the separate src expansion:

  w_meta  = m<<(P+S+1) | pos<<(S+1) | span<<1 | strand
  w_offlo = m<<20 | off[0:20]
  w_offhi = m<<FB | off[20:]
  start   = slot index of the run start (values are the scatter
            positions themselves -> monotone unpacked)

hit_off = a - start replaces (a - prefix_start[src]).
Also: optional q_occ ablation to price the two [B,M] sorts.
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

    MB = max(M - 1, 1).bit_length()   # bits for m
    PB = max(L - 1, 1).bit_length()   # bits for pos
    SB = 6                            # bits for span (capped 63)

    @partial(jax.jit, static_argnames=("mode", "use_qocc"))
    def run(cb, lb, mode, use_qocc=True):
        mins = sketch_compact(cb, lb, k, w, M)
        q_hi, q_lo = mins["key_hi"], mins["key_lo"]
        key_hi, key_lo = dev.key_hi, dev.key_lo
        n_pad = key_lo.shape[0]
        keys32 = dev.keys32
        s = dev.bucket_shift
        b_u = (q_lo >> _U32(s)) | (q_hi << _U32(32 - s)) if 0 < s < 32 \
            else (q_hi >> _U32(s - 32) if s >= 32 else q_lo)
        b = jnp.minimum(b_u, _U32((1 << dev.bucket_bits) - 1)).astype(_I32)
        rows_bm = jnp.arange(B, dtype=_I32)[:, None]
        bs2 = dev.bucket_start[b[:, :, None] + jnp.arange(2, dtype=_I32)]
        idx = lk._lower_bound_2key_ranged(
            key_hi, key_lo, q_hi, q_lo,
            bs2[..., 0], bs2[..., 1], dev.bucket_rounds, keys32=keys32)
        idx_c = jnp.minimum(idx, n_pad - 1)
        found = ((idx < jnp.int32(dev.n_keys))
                 & (key_lo[idx_c] == q_lo)
                 & (mins["pos"] >= 0))
        if not keys32:
            found &= key_hi[idx_c] == q_hi
        cnt_raw = jnp.where(found, dev.counts[idx_c], 0)
        cnt = jnp.where(cnt_raw > jnp.int32(eng.opt.mid_occ), 0, cnt_raw)
        if qof > 0 and use_qocc:
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
            _, q_cnt = jax.lax.sort(
                (s_idx, run_len), dimension=1, num_keys=1)
            n_mins = jnp.sum(slot_valid, axis=1, keepdims=True)
            q_thresh = jnp.maximum(
                (n_mins.astype(jnp.float32) * qof).astype(_I32), 10)
            cnt = jnp.where(q_cnt > q_thresh, 0, cnt)
        off = dev.offsets[idx_c]
        prefix = jnp.concatenate(
            [jnp.zeros((B, 1), _I32),
             jnp.cumsum(cnt, axis=1, dtype=_I32)], axis=1)
        n_anchors = jnp.minimum(prefix[:, -1], A)
        slots = jnp.broadcast_to(jnp.arange(A, dtype=_I32)[None, :], (B, A))
        a_valid = slots < n_anchors[:, None]
        span_col = jnp.minimum(mins["span"].astype(_I32), 63)

        if mode == "gather":
            src = lk._slot_sources(prefix, cnt, A)
            meta = jnp.stack(
                [prefix[:, :-1], off, mins["pos"],
                 mins["strand"].astype(_I32), span_col], axis=-1)
            mrow = meta[rows_bm, src]
            hit_off = slots - mrow[..., 0]
            pos_idx = jnp.where(a_valid, mrow[..., 1] + hit_off, 0)
            q_pos = mrow[..., 2]
            q_strand = mrow[..., 3]
            q_span = mrow[..., 4]
        else:
            starts = prefix[:, :-1]
            m_iota = jnp.broadcast_to(
                jnp.arange(M, dtype=_I32)[None, :], (B, M))
            live = cnt > 0
            rows_scat = jnp.arange(B, dtype=_I32)[:, None]

            def fill(val):
                g = jnp.full((B, A), -1, _I32)
                g = g.at[rows_scat, starts].max(
                    jnp.where(live, val, -1), mode="drop")
                return jax.lax.cummax(g, axis=1)

            w_meta = fill(
                (m_iota << (PB + SB + 1))
                | (mins["pos"] << (SB + 1))
                | (span_col << 1)
                | mins["strand"].astype(_I32))
            w_start = fill(starts)
            OLB = 32 - MB - 1  # low off bits (keep sign bit clear)
            w_offlo = fill((m_iota << OLB) | (off & ((1 << OLB) - 1)))
            w_offhi = fill((m_iota << OLB) | (off >> OLB))
            w_meta = jnp.maximum(w_meta, 0)
            w_start = jnp.maximum(w_start, 0)
            w_offlo = jnp.maximum(w_offlo, 0)
            w_offhi = jnp.maximum(w_offhi, 0)
            offv = ((w_offhi & ((1 << OLB) - 1)) << OLB) | (
                w_offlo & ((1 << OLB) - 1))
            hit_off = slots - w_start
            pos_idx = jnp.where(a_valid, offv + hit_off, 0)
            q_pos = (w_meta >> (SB + 1)) & ((1 << PB) - 1)
            q_strand = w_meta & 1
            q_span = (w_meta >> 1) & ((1 << SB) - 1)

        rid = dev.pos_rid[pos_idx]
        ps = dev.pos_ps[pos_idx]
        rpos = (ps >> _U32(1)).astype(_I32)
        rstrand = (ps & _U32(1)).astype(jnp.uint8)
        rev = q_strand ^ rstrand.astype(_I32)
        qpos = jnp.where(rev == 0, q_pos,
                         lb[:, None] - (q_pos + 1 - q_span) - 1)
        sort_first = jnp.where(a_valid, rev, 2)
        srt = jax.lax.sort(
            (sort_first, rid, rpos, qpos, a_valid.astype(_I32), q_span),
            dimension=1, num_keys=4)
        return srt

    t_g = bench_call(lambda: run(cb, lb, "gather")) * 1e3
    print(f"row-gather meta : {t_g:6.2f} ms", flush=True)
    t_p = bench_call(lambda: run(cb, lb, "packfill")) * 1e3
    print(f"packed fill meta: {t_p:6.2f} ms", flush=True)
    t_nq = bench_call(lambda: run(cb, lb, "packfill", False)) * 1e3
    print(f"packfill, no q_occ: {t_nq:6.2f} ms (q_occ sorts cost "
          f"{t_p - t_nq:+.2f})", flush=True)
    # bit-exactness on the VALID prefix (invalid tail slots carry
    # mode-specific garbage in both formulations, gated off by `valid`
    # everywhere downstream)
    a = [np.asarray(x) for x in run(cb, lb, "gather")]
    bres = [np.asarray(x) for x in run(cb, lb, "packfill")]
    va, vb = a[4].astype(bool), bres[4].astype(bool)
    diffs = int((va != vb).sum())
    for x, y in zip(a, bres):
        diffs += int((np.where(va, x, 0) != np.where(va, y, 0)).sum())
    print(f"valid-masked diffs gather vs packfill: {diffs} "
          f"({int(va.sum())} valid anchors)", flush=True)


if __name__ == "__main__":
    main()
