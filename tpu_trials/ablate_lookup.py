#!/usr/bin/env python
"""Ablation profile of collect_anchors: run the FULL lookup graph with
one gather group at a time replaced by a computed fake (semantically
wrong, structurally identical), so the delta vs the full graph is that
group's true in-graph cost (fusion context preserved).
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

    @partial(jax.jit, static_argnames=("ablate",))
    def run(cb, lb, ablate):
        if ablate == "sketch":
            # structurally identical fake minimizers (no sketch cost)
            pos_f = jnp.broadcast_to(
                jnp.arange(M, dtype=_I32)[None, :] * 5 + k, (B, M))
            mins = {
                "key_hi": jnp.zeros((B, M), _U32),
                "key_lo": (pos_f.astype(_U32) * _U32(2654435761)) >> _U32(4),
                "pos": pos_f,
                "strand": jnp.zeros((B, M), _I32),
                "span": jnp.full((B, M), k, jnp.int8),
                "n": jnp.full((B,), M, _I32),
            }
        else:
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
        b = jnp.minimum(b_u, _U32((1 << dev.bucket_bits) - 1)).astype(_I32)
        rows_bm = jnp.arange(B, dtype=_I32)[:, None]
        if ablate == "dir":
            lo_b = (b * 3) % jnp.int32(dev.n_keys)
            bs2 = jnp.stack([lo_b, lo_b + 8], axis=-1)
        else:
            bs2 = dev.bucket_start[
                b[:, :, None] + jnp.arange(2, dtype=_I32)]
        if ablate == "search":
            idx = jnp.minimum(bs2[..., 0] + (q_lo & 3).astype(_I32),
                              n_pad - 1)
        else:
            idx = lk._lower_bound_2key_ranged(
                key_hi, key_lo, q_hi, q_lo,
                bs2[..., 0], bs2[..., 1], dev.bucket_rounds,
                keys32=keys32)
        idx_c = jnp.minimum(idx, n_pad - 1)
        if ablate == "verify":
            found = (idx < jnp.int32(dev.n_keys)) & (mins["pos"] >= 0)
            cnt_raw = jnp.where(found, (idx_c & 3) + 1, 0)
        else:
            found = (
                (idx < jnp.int32(dev.n_keys))
                & (key_lo[idx_c] == q_lo)
                & (mins["pos"] >= 0))
            if not keys32:
                found &= key_hi[idx_c] == q_hi
            cnt_raw = jnp.where(found, dev.counts[idx_c], 0)
        od, mmo = eng._seed_select_params()
        if od > 0 and mmo > 0 and ablate != "select":
            keep, _resc = lk.seed_select_keep(
                mins["pos"], cnt_raw, found, lb, jnp.int32(eng.opt.mid_occ),
                od, mmo)
            cnt = jnp.where(keep, cnt_raw, 0)
        else:
            cnt = jnp.where(cnt_raw > jnp.int32(eng.opt.mid_occ), 0, cnt_raw)
        if ablate != "rep":
            # rep_len union accounting (mirrors collect_anchors)
            span_arr = mins["span"].astype(_I32)
            filt = found & (cnt_raw > jnp.int32(eng.opt.mid_occ))
            en_f = jnp.where(filt, mins["pos"] + 1, 0)
            prev_en = jnp.concatenate(
                [jnp.zeros((B, 1), _I32),
                 jax.lax.cummax(en_f, axis=1)[:, :-1]], axis=1)
            st_f = mins["pos"] + 1 - span_arr
            contrib = jnp.maximum(en_f - jnp.maximum(st_f, prev_en), 0)
            rep_len = jnp.sum(jnp.where(filt, contrib, 0), axis=1)
        else:
            rep_len = jnp.sum(cnt_raw, axis=1)
        # q_occ filter
        if qof > 0 and ablate != "qocc":
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
        if ablate == "offsets":
            off = idx_c * 2
        else:
            off = dev.offsets[idx_c]
        prefix = jnp.concatenate(
            [jnp.zeros((B, 1), _I32),
             jnp.cumsum(cnt, axis=1, dtype=_I32)], axis=1)
        n_anchors = jnp.minimum(prefix[:, -1], A)
        slots = jnp.broadcast_to(jnp.arange(A, dtype=_I32)[None, :], (B, A))
        if ablate == "slotsrc":
            src = jnp.minimum(slots >> 2, M - 1)
        else:
            src = lk._slot_sources(prefix, cnt, A)
        a_valid = slots < n_anchors[:, None]
        span_col = mins["span"].astype(_I32)
        if ablate == "meta":
            mrow = jnp.stack(
                [slots, slots + 1, slots & 255,
                 slots & 1, jnp.full((B, A), k, _I32)], axis=-1)
        else:
            meta = jnp.stack(
                [prefix[:, :-1], off, mins["pos"],
                 mins["strand"].astype(_I32), span_col], axis=-1)
            mrow = meta[rows_bm, src]
        hit_off = slots - mrow[..., 0]
        pos_idx = jnp.where(a_valid, mrow[..., 1] + hit_off, 0)
        if ablate == "pos":
            rid = pos_idx & 3
            ps = pos_idx.astype(jnp.uint32)
        else:
            rid = dev.pos_rid[pos_idx]
            ps = dev.pos_ps[pos_idx]
        rpos = (ps >> _U32(1)).astype(_I32)
        rstrand = (ps & _U32(1)).astype(jnp.uint8)
        q_pos = mrow[..., 2]
        q_strand = mrow[..., 3]
        q_span = mrow[..., 4]
        rev = q_strand ^ rstrand.astype(_I32)
        qpos = jnp.where(rev == 0, q_pos,
                         lb[:, None] - (q_pos + 1 - q_span) - 1)
        sort_first = jnp.where(a_valid, rev, 2)
        if ablate == "sort":
            return (sort_first, rid, rpos, qpos,
                    a_valid.astype(_I32), q_span, rep_len)
        srt = jax.lax.sort(
            (sort_first, rid, rpos, qpos, a_valid.astype(_I32), q_span),
            dimension=1, num_keys=4)
        return srt + (rep_len,)

    base = bench_call(lambda: run(cb, lb, "none")) * 1e3
    print(f"full lookup graph: {base:6.2f} ms", flush=True)
    for ab in ("sketch", "dir", "search", "verify", "offsets", "select",
               "rep", "qocc", "slotsrc", "meta", "pos", "sort"):
        t = bench_call(lambda ab=ab: run(cb, lb, ab)) * 1e3
        print(f"ablate {ab:8s}: {t:6.2f} ms (group cost {base - t:+6.2f})",
              flush=True)


if __name__ == "__main__":
    main()
