"""Native C++ runtime vs python fallbacks (traceback, encode)."""
import numpy as np
import pytest

from mappy_rs_tpu import native
from mappy_rs_tpu.ops.cigar import traceback_one
from mappy_rs_tpu.ops.extend import ExtendParams, extend_dp
from mappy_rs_tpu.utils.seqcodes import encode as py_encode


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_encode_matches_python():
    s = "ACGTNacgtnXYZuU"
    assert np.array_equal(native.encode(s), py_encode(s))


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_traceback_matches_python():
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    P = ExtendParams(2, 4, 4, 2, 24, 1, 1)
    QMAX = TMAX = 128
    W = 64
    J = 8
    q = np.full((J, QMAX), 4, np.uint8)
    t = np.full((J, TMAX), 4, np.uint8)
    ql = np.zeros(J, np.int32)
    tl = np.zeros(J, np.int32)
    for i in range(J):
        n = int(rng.integers(30, 120))
        a = rng.integers(0, 4, n).astype(np.uint8)
        b = a.copy()
        for _ in range(rng.integers(0, 6)):
            p = int(rng.integers(0, len(b)))
            b[p] = (b[p] + 1) % 4
        q[i, :n] = a
        t[i, : len(b)] = b
        ql[i], tl[i] = n, len(b)
    out = extend_dp(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql), jnp.asarray(tl),
        QMAX, TMAX, W, P,
    )
    dirs = np.asarray(out["dirs"])
    got = native.traceback_batch(dirs, ql, tl, ql - 1, tl - 1)
    assert got is not None
    for i in range(J):
        exp = traceback_one(dirs[:, i, :], int(ql[i]), int(tl[i]), W,
                            int(ql[i]) - 1, int(tl[i]) - 1)
        assert got[i] == exp, f"job {i}"
