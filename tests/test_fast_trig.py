"""Fast-math trig (ops/fast_trig.py): accuracy + gate behavior."""
import os

import jax.numpy as jnp
import numpy as np

from dyglib_tpu.ops import fast_trig


def test_accuracy_small_args():
    x = jnp.asarray(np.random.RandomState(0).uniform(-1e4, 1e4, 20000)
                    .astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(fast_trig.fast_cos(x)), np.cos(np.asarray(x)), atol=2e-4
    )
    s, c = fast_trig.fast_sincos(x)
    np.testing.assert_allclose(np.asarray(s), np.sin(np.asarray(x)), atol=2e-4)
    np.testing.assert_allclose(np.asarray(c), np.cos(np.asarray(x)), atol=2e-4)


def test_large_args_bounded():
    """At huge theta the error may exceed 1e-4 but stays bounded and the
    output stays in [-1-eps, 1+eps] (f32 input quantization dominates)."""
    x = jnp.asarray(np.random.RandomState(1).uniform(-1e7, 1e7, 20000)
                    .astype(np.float32))
    c = np.asarray(fast_trig.fast_cos(x))
    assert np.all(np.abs(c) <= 1.0 + 1e-3)
    assert np.max(np.abs(c - np.cos(np.asarray(x)))) < 0.5


def test_huge_args_bounded():
    """Beyond |x| ~ 5e7 the Cody-Waite reduction is quantization-dominated
    (k*C1 rounding error > pi); the clamp in reduce_2pi must keep the
    polynomial output in [-1, 1] regardless (pre-clamp this diverged to
    |cos| ~ 1e18 at x = 1e9 — ADVICE r4)."""
    rs = np.random.RandomState(3)
    xs = [rs.uniform(-s, s, 5000).astype(np.float32)
          for s in (1e8, 1e9, 1e10)]
    x = jnp.asarray(np.concatenate(xs + [np.float32([1e8, -1e8, 1e9, -1e9,
                                                     5e7, 3.4e38])]))
    c = np.asarray(fast_trig.fast_cos(x))
    s, c2 = map(np.asarray, fast_trig.fast_sincos(x))
    for out in (c, s, c2):
        assert np.all(np.isfinite(out))
        assert np.all(np.abs(out) <= 1.0 + 1e-3)


def test_gate_default_off_on_cpu(monkeypatch):
    monkeypatch.delenv("DYGLIB_FAST_TRIG", raising=False)
    assert not fast_trig.enabled()  # tests force the CPU backend
    monkeypatch.setenv("DYGLIB_FAST_TRIG", "1")
    assert fast_trig.enabled()
    monkeypatch.setenv("DYGLIB_FAST_TRIG", "0")
    assert not fast_trig.enabled()


def test_time_encoder_fast_path_close_to_exact(monkeypatch):
    """TimeEncoder with the fast gate forced ON matches exact cos within
    the bf16 rounding its consumers apply."""
    import jax

    from dyglib_tpu.nn.modules import TimeEncoder

    enc = TimeEncoder(100)
    ts = jnp.asarray(np.random.RandomState(2).uniform(0, 2e5, (64,))
                     .astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), ts)
    exact = enc.apply(params, ts)
    monkeypatch.setenv("DYGLIB_FAST_TRIG", "1")
    fast = enc.apply(params, ts)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=5e-4)
