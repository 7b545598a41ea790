"""Patch-projection kernel (ops/pallas/patch_projection.py) parity.

The kernel's whole-model verdict is NEGATIVE (see its header); these
tests keep the variant correct so the measurement stands on parity-true
code and the option remains usable at other operating points.
"""
import jax
import jax.numpy as jnp
import numpy as np

from dyglib_tpu.ops.pallas.patch_projection import (
    patch_projection,
    patch_projection_reference,
)


def _case(seed=0, M=4, Lp=64, D=12, patch=16, ced=10):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(M, Lp, D).astype(np.float32))
    w = jnp.asarray(rng.randn(patch * D, ced).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(ced).astype(np.float32))
    return x, w, b, patch


def test_forward_matches_oracle():
    x, w, b, patch = _case()
    out = patch_projection(x, w, b, patch)
    ref = patch_projection_reference(x, w, b, patch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_gradients_match_oracle():
    x, w, b, patch = _case(seed=1)

    def loss(fn, w, b):
        return (fn(x, w, b, patch) ** 2).sum()

    g = jax.grad(lambda *a: loss(patch_projection, *a), argnums=(0, 1))(w, b)
    gr = jax.grad(lambda *a: loss(patch_projection_reference, *a),
                  argnums=(0, 1))(w, b)
    for a, r in zip(g, gr):
        scale = float(jnp.abs(r).max()) + 1e-8
        # dW differs at bf16-cotangent rounding (the kernel casts dout to
        # bf16 for the MXU; the oracle's autodiff keeps it f32)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(r) / scale, atol=5e-3
        )


def test_full_model_kernel_matches_plain(link_data):
    """DyGFormer with use_patch_kernel=True == plain path (same params)."""
    from dyglib_tpu.graph import build_temporal_csr
    from dyglib_tpu.graph.csr import time_keys
    from dyglib_tpu.models import DyGFormer, FeatureTables

    d = link_data
    csr = build_temporal_csr(d.train, num_nodes=d.num_nodes)
    tables = FeatureTables(node=jnp.asarray(d.node_raw_features),
                           edge=jnp.asarray(d.edge_raw_features))
    mk = dict(max_input_sequence_length=32, patch_size=4, num_layers=1,
              use_time_kernel=False)
    m_k = DyGFormer(**mk, use_patch_kernel=True)
    m_p = DyGFormer(**mk, use_patch_kernel=False)
    params = m_p.init(jax.random.PRNGKey(0), tables, csr)
    b = 8
    ids = jnp.asarray(
        np.concatenate([d.train.src[:b], d.train.dst[:b],
                        d.train.src[:b], d.train.dst[b:2 * b]]), jnp.int32)
    ts = jnp.tile(jnp.asarray(time_keys(d.train.ts[:b]), jnp.int32), 4)
    inputs = m_k.sample(csr, ids, ts, jax.random.PRNGKey(1))
    out_k = m_k.apply(params, tables, inputs)
    out_p = m_p.apply(params, tables, inputs)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_p), atol=5e-3, rtol=1e-3
    )
