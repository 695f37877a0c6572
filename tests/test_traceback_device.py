"""Device-resident traceback kernel (ops/traceback_pallas.py) must be
bit-identical to the host walk over the same direction tensor, for
both global (mid) and extension (flank) modes — exercised end-to-end
through the pipeline's extension-backend switch."""
import numpy as np
import pytest

import mappy_rs_tpu
from mappy_rs_tpu.ops.extend import ExtendParams
from mappy_rs_tpu.ops.extend_pallas import (
    extend_dp_pallas,
    extend_traceback_device,
)
from mappy_rs_tpu.ops import cigar as cig

PARAMS = ExtendParams(a=2, b=4, q=4, e=2, q2=24, e2=1, sc_ambi=1)


def _mutate(rng, codes, err):
    out = []
    i = 0
    while i < len(codes):
        r = rng.random()
        if r < err * 0.6:
            out.append((codes[i] + 1 + rng.integers(0, 3)) % 4)
            i += 1
        elif r < err * 0.8:
            out.append(codes[i])
            out.append(rng.integers(0, 4))
            i += 1
        elif r < err:
            i += 2
        else:
            out.append(codes[i])
            i += 1
    return np.asarray(out, np.uint8)


def _expected_from_dirs(q, t, ql, tl, W, mode, end_bonus):
    """Host oracle: device DP (interpret) + python walk, exactly the
    pipeline's device_dl decision logic."""
    res = extend_dp_pallas(q, t, ql, tl, W, PARAMS)
    dirs = np.asarray(res["dirs"])
    NEGISH = -(1 << 27)
    out = []
    for ji in range(len(ql)):
        if mode[ji] == 0:
            if int(res["end_sc"][ji]) <= NEGISH:
                out.append(None)
                continue
            si, sj, sc = int(ql[ji]) - 1, int(tl[ji]) - 1, int(res["end_sc"][ji])
        else:
            g_sc, best_sc = int(res["g_sc"][ji]), int(res["best_sc"][ji])
            use_end = g_sc > NEGISH and g_sc + end_bonus >= best_sc
            if use_end and g_sc > 0:
                si, sj, sc = int(ql[ji]) - 1, int(res["g_j"][ji]), g_sc
            elif best_sc > 0:
                si, sj, sc = (
                    int(res["best_i"][ji]), int(res["best_j"][ji]), best_sc
                )
            else:
                out.append(None)
                continue
        ops = cig.traceback_one(dirs[:, ji, :], int(ql[ji]), int(tl[ji]), W,
                                si, sj)
        out.append((ops, sc, si + 1, sj + 1))
    return out


@pytest.mark.parametrize("mode_kind", ["mid", "flank", "mixed"])
def test_device_traceback_matches_host_walk(mode_kind):
    rng = np.random.default_rng(12)
    J, QMAX, TMAX, W = 8, 128, 192, 128
    q = np.full((J, QMAX), 4, np.uint8)
    t = np.full((J, TMAX), 4, np.uint8)
    ql = np.zeros(J, np.int32)
    tl = np.zeros(J, np.int32)
    for ji in range(J):
        tseq = rng.integers(0, 4, rng.integers(80, TMAX)).astype(np.uint8)
        qseq = _mutate(rng, tseq[: rng.integers(60, min(QMAX, len(tseq)))],
                       0.08)[:QMAX]
        q[ji, : len(qseq)] = qseq
        t[ji, : len(tseq)] = tseq
        ql[ji] = len(qseq)
        tl[ji] = len(tseq)
    if mode_kind == "mid":
        mode = np.zeros(J, np.int32)
    elif mode_kind == "flank":
        mode = np.ones(J, np.int32)
    else:
        mode = (np.arange(J) % 2).astype(np.int32)

    end_bonus = 10
    expect = _expected_from_dirs(q, t, ql, tl, W, mode, end_bonus)
    res = extend_traceback_device(q, t, ql, tl, mode, W, PARAMS, end_bonus,
                                  max_ops=128)
    info = res["info"]
    for ji in range(J):
        row = info[ji]
        if expect[ji] is None:
            assert row[4] == 0, (ji, row[:8])
            continue
        ops_e, sc_e, qc_e, tc_e = expect[ji]
        assert row[5] == 0, f"job {ji} overflowed"
        assert row[4] == 1, (ji, row[:8])
        assert int(row[3]) == sc_e, (ji, int(row[3]), sc_e)
        if mode[ji] == 1:
            assert (int(row[6]) + 1, int(row[7]) + 1) == (qc_e, tc_e)
        parts = []
        if int(row[2]) >= 0:
            parts.append((int(row[2]) + 1, 2))
        if int(row[1]) >= 0:
            parts.append((int(row[1]) + 1, 1))
        raw = res["ops"][ji, : int(row[0])][::-1]
        parts.extend((int(v) >> 4, int(v) & 0xF) for v in raw)
        got = cig.merge_cigars([parts])
        assert got == ops_e, (ji, got[:6], ops_e[:6])


def test_pipeline_device_extension_end_to_end():
    """Full map through extension_backend='device' (interpret mode on
    CPU) must equal the host-engine mapping."""
    rng = np.random.default_rng(3)
    genome = "".join(rng.choice(list("ACGT"), size=20_000))
    al = mappy_rs_tpu.Aligner(seq=genome, preset="map-ont")
    reads = []
    for _ in range(6):
        start = int(rng.integers(0, len(genome) - 600))
        tcodes = np.array(
            [{"A": 0, "C": 1, "G": 2, "T": 3}[c]
             for c in genome[start : start + 600]], np.uint8
        )
        qcodes = _mutate(rng, tcodes, 0.06)
        reads.append("".join("ACGT"[c] for c in qcodes))

    host = [al.map(r, cs=True) for r in reads]
    al._engine.cfg.extension_backend = "device"
    dev = [al.map(r, cs=True) for r in reads]
    for hs, ds in zip(host, dev):
        assert len(hs) == len(ds)
        for h, d in zip(hs, ds):
            assert (h.ctg, h.r_st, h.r_en, h.q_st, h.q_en, h.strand) == (
                d.ctg, d.r_st, d.r_en, d.q_st, d.q_en, d.strand
            )
            assert h.cigar == d.cigar
            assert h.cs == d.cs
