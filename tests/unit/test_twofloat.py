"""Double-word f32 arithmetic vs numpy f64 oracles (utils/twofloat.py).

The dw representation claims ~2^-48 relative accuracy; every op is tested
well below the f32 floor (2^-24) and near the dw floor. Also guards the
no-FMA-contraction assumption: if a backend ever contracted Dekker's
a*b - p, two_prod would only get MORE exact, but the split identities
must survive jit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxwell_tpu.utils import twofloat as tf


def _rand(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) * scale).astype(np.float64)


def test_two_sum_exact():
    a64 = _rand(1000, 1)
    b64 = _rand(1000, 2, scale=1e-4)
    a = jnp.asarray(a64, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    s, e = jax.jit(tf.two_sum)(a, b)
    # error-free: s + e == a + b EXACTLY in f64 (f32 inputs are exact f64)
    lhs = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    rhs = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    np.testing.assert_array_equal(lhs, rhs)


def test_two_prod_exact():
    a = jnp.asarray(_rand(1000, 3), jnp.float32)
    b = jnp.asarray(_rand(1000, 4), jnp.float32)
    p, e = jax.jit(tf.two_prod)(a, b)
    lhs = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    rhs = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    np.testing.assert_array_equal(lhs, rhs)


def test_dw_add_mul_accuracy():
    x64 = _rand(4096, 5)
    y64 = _rand(4096, 6)
    xh, xl = tf.dw_from_f64(x64)
    yh, yl = tf.dw_from_f64(y64)
    x64 = tf.dw_to_f64(xh, xl)  # the exactly-representable dw value
    y64 = tf.dw_to_f64(yh, yl)

    sh, sl = jax.jit(tf.dw_add)(
        jnp.asarray(xh), jnp.asarray(xl), jnp.asarray(yh), jnp.asarray(yl)
    )
    rel = np.abs(tf.dw_to_f64(sh, sl) - (x64 + y64)) / np.maximum(
        np.abs(x64 + y64), 1e-30
    )
    assert rel.max() < 1e-12  # dw_add worst case grows near cancellation

    ph, pl = jax.jit(tf.dw_mul)(
        jnp.asarray(xh), jnp.asarray(xl), jnp.asarray(yh), jnp.asarray(yl)
    )
    rel = np.abs(tf.dw_to_f64(ph, pl) - x64 * y64) / np.maximum(
        np.abs(x64 * y64), 1e-30
    )
    assert rel.max() < 2e-13


def test_dw_div_f():
    x64 = _rand(1024, 7)
    c = jnp.asarray(_rand(1024, 8) + 3.0, jnp.float32)
    xh, xl = tf.dw_from_f64(x64)
    qh, ql = jax.jit(tf.dw_div_f)(jnp.asarray(xh), jnp.asarray(xl), c)
    ref = tf.dw_to_f64(xh, xl) / np.asarray(c, np.float64)
    rel = np.abs(tf.dw_to_f64(qh, ql) - ref) / np.abs(ref)
    assert rel.max() < 2e-13


@pytest.mark.parametrize("n", [1, 7, 1024, 100_000])
def test_dw_sum_accuracy(n):
    x64 = _rand(n, 9)
    xh, xl = tf.dw_from_f64(x64)
    sh, sl = jax.jit(tf.dw_sum)(jnp.asarray(xh), jnp.asarray(xl))
    ref = tf.dw_to_f64(xh, xl).sum()  # f64 sum of exactly-held values
    # n=1e5 f32 naive sum would be ~1e-4 off; dw must hold ~1e-11
    assert abs(tf.dw_to_f64(sh, sl) - ref) <= 1e-11 * max(
        np.abs(x64).sum(), 1.0
    )


def test_dw_dot_and_gram():
    n, m = 5000, 4
    X64 = _rand((n, m), 10)
    Y64 = _rand((n, m), 11)
    xh, xl = tf.dw_from_f64(X64)
    yh, yl = tf.dw_from_f64(Y64)
    X64 = tf.dw_to_f64(xh, xl)
    Y64 = tf.dw_to_f64(yh, yl)
    gh, gl = jax.jit(tf.dw_gram)(
        jnp.asarray(xh), jnp.asarray(xl), jnp.asarray(yh), jnp.asarray(yl)
    )
    ref = X64.T @ Y64
    rel = np.abs(tf.dw_to_f64(gh, gl) - ref) / np.abs(ref).max()
    assert rel.max() < 1e-11


def test_dw_matmul_small_exact_rotation():
    n, m = 3000, 5
    X64 = _rand((n, m), 12)
    C64 = np.linalg.qr(_rand((m, m), 13))[0]  # orthogonal rotation
    xh, xl = tf.dw_from_f64(X64)
    ch, cl = tf.dw_from_f64(C64)
    oh, ol = jax.jit(tf.dw_matmul_small)(
        jnp.asarray(xh), jnp.asarray(xl), jnp.asarray(ch), jnp.asarray(cl)
    )
    ref = tf.dw_to_f64(xh, xl) @ tf.dw_to_f64(ch, cl)
    rel = np.abs(tf.dw_to_f64(oh, ol) - ref) / np.abs(ref).max()
    assert rel.max() < 1e-12


def test_arena_cap_evicts_free_entries(monkeypatch):
    """Round-3 advisor (medium): the host arena must not grow without
    bound — free entries are evicted largest-first when a new allocation
    would exceed MAXWELL_TPU_ARENA_CAP."""
    import maxwell_tpu.sparse.bellunion as bu

    monkeypatch.setenv("MAXWELL_TPU_ARENA_CAP", str(300 * 1024 * 1024))
    saved = list(bu._ARENA)
    bu._ARENA.clear()
    stats0 = bu.arena_stats()
    try:
        a = bu._aligned_zeros((150 * 1024 * 1024 // 4,), np.float32)
        b = bu._aligned_zeros((120 * 1024 * 1024 // 4,), np.float32)
        assert len(bu._ARENA) == 2
        del a, b  # both entries become free (weakrefs die)
        c = bu._aligned_zeros((200 * 1024 * 1024 // 4,), np.float32)
        # cap is 300 MB: at least one of the 150/120 MB entries must have
        # been unmapped to make room for the 200 MB entry
        total = sum(e[2] for e in bu._ARENA)
        assert total <= 300 * 1024 * 1024 + 1, f"pool at {total}"
        assert bu.arena_stats()["evictions"] > stats0["evictions"]
        del c
    finally:
        for e in bu._ARENA:
            try:
                e[0].close()
            except Exception:
                pass
        bu._ARENA.clear()
        bu._ARENA.extend(saved)
