"""Fused Pallas temporal attention == the XLA module path (same params)."""
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier (see pytest.ini)
import jax
import jax.numpy as jnp
import numpy as np

from dyglib_tpu.nn.modules import TemporalMultiHeadAttention


def _inputs(b=9, k=7, dn=172, de=172, dt=100, seed=0):
    rng = np.random.default_rng(seed)
    node_f = rng.normal(size=(b, dn)).astype(np.float32)
    node_tf = rng.normal(size=(b, dt)).astype(np.float32)
    nbr_f = rng.normal(size=(b, k, dn)).astype(np.float32)
    nbr_tf = rng.normal(size=(b, k, dt)).astype(np.float32)
    nbr_ef = rng.normal(size=(b, k, de)).astype(np.float32)
    mask = rng.integers(0, 2, size=(b, k)).astype(bool)
    mask[0] = False  # fully-padded row must stay finite
    mask[1] = True
    return tuple(
        jnp.asarray(x) for x in (node_f, node_tf, nbr_f, nbr_tf, nbr_ef, mask)
    )


def test_fused_attention_matches_xla_forward():
    args = _inputs()
    ref = TemporalMultiHeadAttention(num_heads=2, dropout=0.1, use_pallas=False)
    fused = TemporalMultiHeadAttention(num_heads=2, dropout=0.1, use_pallas=True)
    params = ref.init(jax.random.PRNGKey(0), *args)
    # identical param trees by construction
    out_r, sc_r = ref.apply(params, *args, train=False)
    out_f, sc_f = fused.apply(params, *args, train=False)
    # the kernel's matmuls are bf16 with f32 accumulation (TPU's default
    # matmul precision); the CPU XLA reference computes true-f32 dots, so
    # tolerances are bf16-scale
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r), atol=3e-2)
    assert float(np.abs(np.asarray(out_f) - np.asarray(out_r)).mean()) < 3e-3
    np.testing.assert_allclose(np.asarray(sc_f), np.asarray(sc_r), atol=5e-3)
    assert np.isfinite(np.asarray(out_f)).all()


def test_fused_attention_matches_xla_grads():
    args = _inputs(seed=3)
    ref = TemporalMultiHeadAttention(num_heads=2, dropout=0.0, use_pallas=False)
    fused = TemporalMultiHeadAttention(num_heads=2, dropout=0.0, use_pallas=True)
    params = ref.init(jax.random.PRNGKey(1), *args)

    def loss(module):
        def f(p, nbr_f, nbr_tf):
            a = (args[0], args[1], nbr_f, nbr_tf) + args[4:]
            out, _ = module.apply(p, *a, train=False)
            return (out * out).mean()

        return jax.grad(f, argnums=(0, 1, 2))(params, args[2], args[3])

    gp_r, gn_r, gt_r = loss(ref)
    gp_f, gn_f, gt_f = loss(fused)
    for a, b in zip(jax.tree_util.tree_leaves(gp_r), jax.tree_util.tree_leaves(gp_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-3)
    np.testing.assert_allclose(np.asarray(gn_f), np.asarray(gn_r), atol=5e-3)
    np.testing.assert_allclose(np.asarray(gt_f), np.asarray(gt_r), atol=5e-3)


def test_fused_attention_dropout_trains_finite():
    args = _inputs(seed=5)
    fused = TemporalMultiHeadAttention(num_heads=2, dropout=0.2, use_pallas=True)
    params = fused.init(jax.random.PRNGKey(2), *args)

    def f(p):
        out, _ = fused.apply(
            p, *args, train=True, rngs={"dropout": jax.random.PRNGKey(7)}
        )
        return (out * out).mean()

    val, grads = jax.value_and_grad(f)(params)
    assert np.isfinite(float(val))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all()
