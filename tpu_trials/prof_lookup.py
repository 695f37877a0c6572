#!/usr/bin/env python
"""Decompose collect_anchors' device time on the 32Mbp index:
binary search | +hit meta | +slot expansion | +pos gather | +sort |
+q_occ filter.  Pipelined (10 in flight), B=256, L=1024 production
shapes.
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
    from bench import ERROR_RATE, GENOME_LEN, READ_LEN, simulate
    from mappy_rs_tpu import Aligner
    from mappy_rs_tpu.models.pipeline import _pow2_at_least
    from mappy_rs_tpu.ops import lookup as LK
    from mappy_rs_tpu.ops.sketch import sketch_compact
    from mappy_rs_tpu.utils.seqcodes import encode

    rng = np.random.default_rng(0)
    genome = bytes(
        np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, GENOME_LEN)]
    ).decode()
    reads, _ = simulate(rng, genome, 512, READ_LEN, ERROR_RATE)
    al = Aligner(seq=genome, preset="map-ont")
    eng = al._engine
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
    cb, lb = jnp.asarray(batch), jnp.asarray(lens)
    print(f"keys={dev.n_keys} pad={dev.key_lo.shape[0]} "
          f"bb={dev.bucket_bits} rounds={dev.bucket_rounds} "
          f"keys32={dev.keys32}", flush=True)

    mins_j = jax.jit(
        partial(sketch_compact, k=k, w=w, max_minimizers=M)
    )(cb, lb)
    mins_j = jax.tree.map(jnp.asarray, mins_j)
    jax.block_until_ready(mins_j)

    I32, U32 = jnp.int32, jnp.uint32

    def stage(upto):
        @jax.jit
        def f(mins, lens):
            q_hi, q_lo = mins["key_hi"], mins["key_lo"]
            Bq, Mq = q_hi.shape
            s = dev.bucket_shift
            b_u = (q_lo >> U32(s)) | (q_hi << U32(32 - s)) if 0 < s < 32 \
                else (q_lo if s == 0 else q_hi >> U32(s - 32))
            b = jnp.minimum(
                b_u, U32((1 << dev.bucket_bits) - 1)
            ).astype(I32)
            idx = LK._lower_bound_2key_ranged(
                dev.key_hi, dev.key_lo, q_hi, q_lo,
                dev.bucket_start[b], dev.bucket_start[b + 1],
                dev.bucket_rounds, keys32=dev.keys32,
            )
            if upto == "search":
                return idx
            idx_c = jnp.minimum(idx, dev.key_lo.shape[0] - 1)
            found = (
                (idx < dev.n_keys) & (dev.key_lo[idx_c] == q_lo)
                & (mins["pos"] >= 0)
            )
            cnt = jnp.where(found, dev.counts[idx_c], 0)
            cnt = jnp.where(cnt > eng.opt.mid_occ, 0, cnt)
            off = dev.offsets[idx_c]
            if upto == "meta":
                return cnt, off
            prefix = jnp.concatenate(
                [jnp.zeros((Bq, 1), I32),
                 jnp.cumsum(cnt, axis=1, dtype=I32)], axis=1
            )
            n_anchors = jnp.minimum(prefix[:, -1], A)
            slots = jnp.broadcast_to(jnp.arange(A, dtype=I32)[None, :], (Bq, A))
            src = LK._searchsorted_rows(prefix, slots)
            rows = jnp.arange(Bq, dtype=I32)[:, None]
            a_valid = slots < n_anchors[:, None]
            hit_off = slots - prefix[rows, src]
            pos_idx = jnp.where(a_valid, off[rows, src] + hit_off, 0)
            if upto == "expand":
                return pos_idx
            rid = dev.pos_rid[pos_idx]
            ps = dev.pos_ps[pos_idx]
            rpos = (ps >> U32(1)).astype(I32)
            rstrand = (ps & U32(1)).astype(jnp.uint8)
            q_pos = mins["pos"][rows, src]
            q_strand = mins["strand"][rows, src]
            q_span = mins["span"][rows, src].astype(I32) if "span" in mins \
                else jnp.full_like(q_pos, k)
            rev = (q_strand ^ rstrand).astype(I32)
            qpos = jnp.where(rev == 0, q_pos,
                             lens[:, None] - (q_pos + 1 - q_span) - 1)
            if upto == "gather":
                return rid, rpos, qpos
            sort_first = jnp.where(a_valid, rev, 2)
            srt = jax.lax.sort(
                (sort_first, rid, rpos, qpos, a_valid.astype(I32), q_span),
                dimension=1, num_keys=4,
            )
            return srt

        return f

    for name in ("search", "meta", "expand", "gather", "sort"):
        f = stage(name)
        t = bench_call(lambda f=f: f(mins_j, lb))
        print(f"up to {name:7s}: {t*1e3:6.1f} ms", flush=True)

    # full collect_anchors incl. q_occ + rep_len (production graph)
    def full():
        return LK.collect_anchors(
            mins_j, lb, dev.key_hi, dev.key_lo, dev.offsets, dev.counts,
            dev.pos_rid, dev.pos_ps, jnp.int32(dev.n_keys),
            jnp.int32(eng.opt.mid_occ), A, k,
            float(eng.opt.q_occ_frac), dev.bucket_start,
            dev.bucket_bits, dev.bucket_rounds, dev.bucket_shift,
        )

    t = bench_call(full)
    print(f"full collect_anchors: {t*1e3:6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
