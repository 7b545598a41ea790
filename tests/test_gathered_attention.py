"""Post-gather fused attention kernel (ops/pallas/gathered_attention.py).

Parity layers (mirrors tests/test_window_attention.py):
  1. kernel == pure-XLA oracle with identical bf16 math — forward and
     every gradient, including an all-padded row;
  2. full TGAT with use_gathered_attention=True == plain XLA TGAT
     (the end-to-end integration contract);
  3. gradients of the full gathered-kernel TGAT match the plain path.

On CPU the kernel runs in Pallas interpret mode; the same code compiles
via Mosaic on TPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier (see pytest.ini)

from dyglib_tpu.graph.csr import build_temporal_csr
from dyglib_tpu.models import FeatureTables, TGAT
from dyglib_tpu.ops.pallas.gathered_attention import (
    gathered_attention,
    gathered_attention_reference,
)


def _rand_case(seed=0, M=50, K=20, Dn=12, De=12, Dt=10, Dq=16, H=2):
    rng = np.random.RandomState(seed)
    q3 = jnp.asarray(rng.randn(M, Dq).astype(np.float32))
    feat_n = jnp.asarray(rng.randn(M * K, Dn).astype(np.float32))
    feat_e = jnp.asarray(rng.randn(M * K, De).astype(np.float32))
    dt = jnp.asarray((rng.rand(M, K) * 5).astype(np.float32))
    mask = jnp.asarray((rng.rand(M, K) > 0.3).astype(np.float32))
    mask = mask.at[3].set(0.0)  # an all-padded row (uniform attention)
    keep = jnp.asarray((rng.rand(M, H, K) > 0.1).astype(np.float32) / 0.9)
    tw = jnp.asarray(rng.randn(Dt).astype(np.float32))
    tb = jnp.asarray(rng.randn(Dt).astype(np.float32))
    wk = jnp.asarray((rng.randn(Dn + De + Dt, Dq) * 0.1).astype(np.float32))
    wv = jnp.asarray((rng.randn(Dn + De + Dt, Dq) * 0.1).astype(np.float32))
    return q3, feat_n, feat_e, dt, mask, keep, (tw, tb), (wk, wv), H


@pytest.mark.parametrize("seed,m", [(0, 50), (2, 7)])  # m=7 < BLK: pad path
def test_kernel_matches_oracle_forward(seed, m):
    args = _rand_case(seed=seed, M=m)
    out = gathered_attention(*args)
    ref = gathered_attention_reference(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_kernel_matches_oracle_gradients():
    q3, feat_n, feat_e, dt, mask, keep, time_wb, wkv, H = _rand_case(seed=1)

    def loss(fn, q3, time_wb, wkv):
        return (
            fn(q3, feat_n, feat_e, dt, mask, keep, time_wb, wkv, H) ** 2
        ).sum()

    g = jax.grad(
        lambda *a: loss(gathered_attention, *a), argnums=(0, 1, 2)
    )(q3, time_wb, wkv)
    gr = jax.grad(
        lambda *a: loss(gathered_attention_reference, *a), argnums=(0, 1, 2)
    )(q3, time_wb, wkv)
    # dq3 goes through no bf16 reduction reordering -> tight; weight and
    # time-encoder grads accumulate bf16 matmul blocks in a different
    # order than the oracle's single big matmul -> relative tolerance
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(gr[0]), atol=1e-5)
    for a, b in [
        (g[1][0], gr[1][0]), (g[1][1], gr[1][1]),
        (g[2][0], gr[2][0]), (g[2][1], gr[2][1]),
    ]:
        scale = float(jnp.abs(b).max()) + 1e-6
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-3
        )


@pytest.fixture(scope="module")
def tgat_setup(link_data):
    d = link_data
    csr = build_temporal_csr(d.train, num_nodes=d.num_nodes)
    tables = FeatureTables(
        node=jnp.asarray(d.node_raw_features),
        edge=jnp.asarray(d.edge_raw_features),
    )
    return d, csr, tables


def test_tgat_gathered_matches_plain(tgat_setup):
    d, csr, tables = tgat_setup
    m_gath = TGAT(num_neighbors=5, num_layers=2, use_gathered_attention=True)
    m_plain = TGAT(num_neighbors=5, num_layers=2,
                   use_gathered_attention=False)
    assert m_gath._gathered_kernel and not m_plain._gathered_kernel
    params = m_plain.init(jax.random.PRNGKey(0), tables, csr)

    b = 32
    ids = jnp.asarray(d.train.src[:b], jnp.int32)
    # mix of warm and cold (empty-history) query times
    ts = jnp.asarray(
        np.r_[d.train.ts[: b // 2], d.train.ts[-(b - b // 2):]], jnp.int32
    )
    key = jax.random.PRNGKey(1)
    inputs = m_gath.sample(csr, ids, ts, key)
    out_g = m_gath.apply(params, tables, inputs)
    out_p = m_plain.apply(params, tables, inputs)
    np.testing.assert_allclose(
        np.asarray(out_g), np.asarray(out_p), atol=5e-2, rtol=1e-2
    )
    assert float(jnp.abs(out_g - out_p).mean()) < 5e-3


def test_tgat_gathered_gradients_match_plain(tgat_setup):
    d, csr, tables = tgat_setup
    m_gath = TGAT(num_neighbors=5, num_layers=2, use_gathered_attention=True)
    m_plain = TGAT(num_neighbors=5, num_layers=2,
                   use_gathered_attention=False)
    params = m_plain.init(jax.random.PRNGKey(0), tables, csr)

    b = 16
    ids = jnp.asarray(d.train.src[:b], jnp.int32)
    ts = jnp.asarray(d.train.ts[:b], jnp.int32)
    inputs = m_gath.sample(csr, ids, ts, jax.random.PRNGKey(1))

    gg = jax.grad(lambda p: (m_gath.apply(p, tables, inputs) ** 2).sum())(
        params
    )
    gp = jax.grad(lambda p: (m_plain.apply(p, tables, inputs) ** 2).sum())(
        params
    )
    flat_g = jax.tree_util.tree_leaves_with_path(gg)
    flat_p = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gp)}
    checked = 0
    for k, v in flat_g:
        ref = flat_p[jax.tree_util.keystr(k)]
        scale = float(jnp.abs(ref).max()) + 1e-6
        np.testing.assert_allclose(
            np.asarray(v) / scale, np.asarray(ref) / scale, atol=2e-2,
            err_msg=jax.tree_util.keystr(k),
        )
        checked += 1
    assert checked == len(flat_p)
