"""Fused Phi(dt) @ W projection kernel (ops/pallas/phi_projection.py).

Parity: (1) kernel == pure-XLA oracle (forward + every gradient);
(2) full TGAT with use_phi_fusion=True == plain path (outputs + param
gradients). On CPU the kernel runs in Pallas interpret mode.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier (see pytest.ini)

from dyglib_tpu.graph import build_temporal_csr
from dyglib_tpu.models import FeatureTables, TGAT
from dyglib_tpu.ops.pallas.phi_projection import (
    phi_projection,
    phi_projection_reference,
)


def _case(seed=0, R=300, Dt=10, Dq=16):
    rng = np.random.RandomState(seed)
    dt = jnp.asarray((rng.rand(R) * 1e4).astype(np.float32))
    tw = jnp.asarray((rng.randn(Dt) * 0.1).astype(np.float32))
    tb = jnp.asarray(rng.randn(Dt).astype(np.float32))
    w = jnp.asarray((rng.randn(Dt, Dq) * 0.1).astype(np.float32))
    return dt, tw, tb, w


def test_kernel_matches_oracle_forward():
    args = _case()
    out = phi_projection(*args)
    ref = phi_projection_reference(*args)
    # 1e-3: bf16 rounding (eps ~ 8e-3 at O(1) operands) differs between
    # the interpret-mode dot and the oracle's jnp.dot accumulation order
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_kernel_matches_oracle_gradients():
    dt, tw, tb, w = _case(seed=1)

    def loss(fn, tw, tb, w):
        return (fn(dt, tw, tb, w) ** 2).sum()

    g = jax.grad(lambda *a: loss(phi_projection, *a), argnums=(0, 1, 2))(
        tw, tb, w
    )
    gr = jax.grad(
        lambda *a: loss(phi_projection_reference, *a), argnums=(0, 1, 2)
    )(tw, tb, w)
    for a, b in zip(g, gr):
        scale = float(jnp.abs(b).max()) + 1e-6
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-3
        )


def test_tgat_phi_fusion_matches_plain(link_data):
    d = link_data
    csr = build_temporal_csr(d.train, num_nodes=d.num_nodes)
    tables = FeatureTables(
        node=jnp.asarray(d.node_raw_features),
        edge=jnp.asarray(d.edge_raw_features),
    )
    m_f = TGAT(num_neighbors=5, num_layers=2, use_phi_fusion=True)
    m_p = TGAT(num_neighbors=5, num_layers=2, use_phi_fusion=False)
    assert m_f._phi_fusion and not m_p._phi_fusion
    params = m_p.init(jax.random.PRNGKey(0), tables, csr)

    b = 24
    ids = jnp.asarray(d.train.src[:b], jnp.int32)
    ts = jnp.asarray(
        np.r_[d.train.ts[: b // 2], d.train.ts[-(b - b // 2):]], jnp.int32
    )
    inputs = m_f.sample(csr, ids, ts, jax.random.PRNGKey(1))
    out_f = m_f.apply(params, tables, inputs)
    out_p = m_p.apply(params, tables, inputs)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_p), atol=5e-2, rtol=1e-2
    )
    assert float(jnp.abs(out_f - out_p).mean()) < 5e-3

    gf = jax.grad(lambda p: (m_f.apply(p, tables, inputs) ** 2).sum())(params)
    gp = jax.grad(lambda p: (m_p.apply(p, tables, inputs) ** 2).sum())(params)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_p = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gp)}
    global_scale = max(float(jnp.abs(v).max()) for v in flat_p.values())
    for k, v in flat_f:
        ref = flat_p[jax.tree_util.keystr(k)]
        scale = float(jnp.abs(ref).max())
        if scale < 1e-6 * global_scale:
            assert float(jnp.abs(v).max()) < 1e-5 * global_scale
            continue
        np.testing.assert_allclose(
            np.asarray(v) / scale, np.asarray(ref) / scale, atol=2e-2,
            err_msg=jax.tree_util.keystr(k),
        )
