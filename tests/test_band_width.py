"""Narrow logical bands (mid_band_floor/slack) and the Mosaic
physical-lane padding (_w_phys): a W=64/96 band computed inside a
128-lane physical block must be bit-identical to the physically
narrow band — and to the XLA and C++ engines at the same W."""
import numpy as np
import pytest

from mappy_rs_tpu.ops.extend import ExtendParams, extend_dp
import mappy_rs_tpu.ops.extend_pallas as ep

P = ExtendParams(a=2, b=4, q=4, e=2, q2=24, e2=1, sc_ambi=1)


def _jobs(J=8, n=300, err=0.06, seed=5):
    rng = np.random.default_rng(seed)
    QS = TS = 384
    q = np.full((J, QS), 4, np.uint8)
    t = np.full((J, TS), 4, np.uint8)
    ql = np.zeros(J, np.int32)
    tl = np.zeros(J, np.int32)
    for i in range(J):
        m = int(rng.integers(n - 40, n + 40))
        a = rng.integers(0, 4, m).astype(np.uint8)
        b = list(a)
        for p in rng.integers(0, m - 4, int(m * err)):
            r = rng.random()
            if r < 0.5:
                b[p] = (b[p] + 1) % 4
            elif r < 0.75:
                b.insert(p, rng.integers(0, 4))
            else:
                del b[p]
        b = np.asarray(b[: TS], np.uint8)
        q[i, :m] = a
        t[i, : len(b)] = b
        ql[i], tl[i] = m, len(b)
    return q, t, ql, tl


@pytest.mark.parametrize("W", [64, 96])
def test_masked_physical_lanes_bit_identical(W, monkeypatch):
    """Force the 128-lane physical path (as on a real TPU) and compare
    against the physically narrow band and the XLA reference."""
    q, t, ql, tl = _jobs()
    import jax.numpy as jnp

    narrow = ep.extend_dp_pallas(q, t, ql, tl, W, P)
    monkeypatch.setattr(ep, "_w_phys", lambda w: 128 if w < 128 else w)
    padded = ep.extend_dp_pallas(q, t, ql, tl, W, P)
    for k in ("best_sc", "best_i", "best_j", "g_sc", "g_j", "end_sc"):
        assert np.array_equal(np.asarray(narrow[k]), np.asarray(padded[k])), k
    dn = np.asarray(narrow["dirs"])
    dp_ = np.asarray(padded["dirs"])
    assert dp_.shape[2] == W  # wrapper slices back to logical width
    assert np.array_equal(dn, dp_)
    # XLA reference at the same W
    QMAX, TMAX = q.shape[1], t.shape[1]
    ref = extend_dp(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql), jnp.asarray(tl),
        QMAX, TMAX, W, P,
    )
    for k in ("best_sc", "end_sc"):
        assert np.array_equal(np.asarray(narrow[k]), np.asarray(ref[k])), k


@pytest.mark.parametrize("W", [64, 96])
def test_masked_traceback_device_bit_identical(W, monkeypatch):
    q, t, ql, tl = _jobs(seed=9)
    mode = np.asarray([0, 1] * (len(ql) // 2), np.int32)
    narrow = ep.extend_traceback_device(q, t, ql, tl, mode, W, P, 10)
    monkeypatch.setattr(ep, "_w_phys", lambda w: 128 if w < 128 else w)
    padded = ep.extend_traceback_device(q, t, ql, tl, mode, W, P, 10)
    assert np.array_equal(narrow["ops"], padded["ops"])
    assert np.array_equal(narrow["info"], padded["info"])


def test_native_engine_same_w(monkeypatch):
    """C++ engine at W=64 equals the Pallas DP at W=64 on scores."""
    from mappy_rs_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    q, t, ql, tl = _jobs(seed=13)
    W = 64
    dev = ep.extend_dp_pallas(q, t, ql, tl, W, P)
    host = native.extend_banded_batch(q, t, ql, tl, W, P, 0, 1, 0)
    for j in range(len(ql)):
        assert host[j][1] == int(np.asarray(dev["best_sc"])[j])
