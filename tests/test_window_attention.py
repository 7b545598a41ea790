"""Fused window-gather attention kernel (ops/pallas/window_attention.py).

Parity layers:
  1. kernel == pure-XLA oracle with identical bf16 math (tight tolerance,
     forward and every gradient), including empty / straddling windows;
  2. full TGAT with the fused path ON == plain row-gather TGAT (loose
     f32-vs-bf16 tolerance) — the end-to-end integration contract;
  3. gradients of the full fused TGAT match the plain path.

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
from dyglib_tpu.ops.pallas.window_attention import (
    window_attention,
    window_attention_reference,
)


def _rand_case(seed=0, M=50, K=20, Dn=12, De=12, Dt=10, Dq=16, H=2, T=300):
    rng = np.random.RandomState(seed)
    # table carries 8 extra PAD columns (production feat_entry pads the
    # lane dim to the 128 tiling); the kernel must ignore them
    table = jnp.asarray(rng.randn(T, Dn + De + 8).astype(np.float32))
    q3 = jnp.asarray(rng.randn(M, Dq).astype(np.float32))
    starts = jnp.asarray(rng.randint(0, T - K, size=(M,)).astype(np.int32))
    dt = jnp.asarray((rng.rand(M, K) * 5).astype(np.float32))
    mask = jnp.asarray((rng.rand(M, K) > 0.3).astype(np.float32))
    mask = mask.at[3].set(0.0)  # an all-padded row (uniform attention)
    keep = jnp.asarray((rng.rand(M, H, K) > 0.1).astype(np.float32) / 0.9)
    tw = jnp.asarray(rng.randn(Dt).astype(np.float32))
    tb = jnp.asarray(rng.randn(Dt).astype(np.float32))
    wk = jnp.asarray((rng.randn(Dn + De + Dt, Dq) * 0.1).astype(np.float32))
    wv = jnp.asarray((rng.randn(Dn + De + Dt, Dq) * 0.1).astype(np.float32))
    return q3, starts, dt, mask, keep, table, tw, tb, (wk, wv), H


def test_kernel_matches_oracle_forward():
    args = _rand_case()
    out = window_attention(*args)
    ref = window_attention_reference(*args)
    # 2e-4: the kernel contracts over the lane-padded width (zero weight
    # rows), so bf16 product accumulation groups differently than the
    # oracle's unpadded dot
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_kernel_matches_oracle_gradients():
    q3, starts, dt, mask, keep, table, tw, tb, wkv, H = _rand_case(seed=1)

    def loss(fn, q3, tw, tb, wkv):
        return (
            fn(q3, starts, dt, mask, keep, table, tw, tb, wkv, H) ** 2
        ).sum()

    g = jax.grad(lambda *a: loss(window_attention, *a), argnums=(0, 1, 2, 3))(
        q3, tw, tb, wkv
    )
    gr = jax.grad(
        lambda *a: loss(window_attention_reference, *a), argnums=(0, 1, 2, 3)
    )(q3, tw, tb, wkv)
    # dq3 goes through no bf16 reduction reordering -> tight; the weight
    # and time-encoder grads accumulate bf16 matmul blocks in a different
    # order than the oracle's single big matmul -> relative tolerance
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(gr[0]), atol=1e-5)
    for a, b in [(g[1], gr[1]), (g[2], gr[2]),
                 (g[3][0], gr[3][0]), (g[3][1], gr[3][1])]:
        scale = float(jnp.abs(b).max()) + 1e-6
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-3
        )


@pytest.fixture(scope="module")
def tgat_setup(link_data):
    d = link_data
    fex = (d.node_raw_features, d.edge_raw_features)
    csr_win = build_temporal_csr(d.train, num_nodes=d.num_nodes, feat_entry_of=fex)
    csr_plain = build_temporal_csr(d.train, num_nodes=d.num_nodes)
    tables = FeatureTables(
        node=jnp.asarray(d.node_raw_features),
        edge=jnp.asarray(d.edge_raw_features),
    )
    return d, csr_win, csr_plain, tables


def test_tgat_fused_matches_plain(tgat_setup):
    d, csr_win, csr_plain, tables = tgat_setup
    m_fused = TGAT(num_neighbors=5, num_layers=2,
                   use_window_attention=True, wants_entry_features=True)
    m_plain = TGAT(num_neighbors=5, num_layers=2, use_window_attention=False)
    assert m_fused._window_kernel and not m_plain._window_kernel
    params = m_plain.init(jax.random.PRNGKey(0), tables, csr_plain)

    b = 32
    ids = jnp.asarray(d.train.src[:b], jnp.int32)
    # mix of warm and cold (empty-history) query times
    ts = jnp.asarray(
        np.r_[d.train.ts[: b // 2], d.train.ts[-(b - b // 2):]], jnp.int32
    )
    key = jax.random.PRNGKey(1)
    in_fused = m_fused.sample(csr_win, ids, ts, key)
    in_plain = m_plain.sample(csr_plain, ids, ts, key)
    assert in_fused.hop_win_start is not None
    # fused mode materializes one hop fewer of features
    assert len(in_fused.hop_node_feat) == 1
    out_f = m_fused.apply(params, tables, in_fused)
    out_p = m_plain.apply(params, tables, in_plain)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_p), atol=5e-2, rtol=1e-2
    )
    # and the two fixed-point outputs agree closely in distribution
    assert float(jnp.abs(out_f - out_p).mean()) < 5e-3


def test_tgat_fused_gradients_match_plain(tgat_setup):
    d, csr_win, csr_plain, tables = tgat_setup
    m_fused = TGAT(num_neighbors=5, num_layers=2,
                   use_window_attention=True, wants_entry_features=True)
    m_plain = TGAT(num_neighbors=5, num_layers=2, use_window_attention=False)
    params = m_plain.init(jax.random.PRNGKey(0), tables, csr_plain)

    b = 16
    ids = jnp.asarray(d.train.src[:b], jnp.int32)
    ts = jnp.asarray(d.train.ts[:b], jnp.int32)
    key = jax.random.PRNGKey(1)
    in_fused = m_fused.sample(csr_win, ids, ts, key)
    in_plain = m_plain.sample(csr_plain, ids, ts, key)

    gf = jax.grad(lambda p: (m_fused.apply(p, tables, in_fused) ** 2).sum())(
        params
    )
    gp = jax.grad(lambda p: (m_plain.apply(p, tables, in_plain) ** 2).sum())(
        params
    )
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_p = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gp)}
    checked = 0
    for k, v in flat_f:
        ref = flat_p[jax.tree_util.keystr(k)]
        scale = float(jnp.abs(ref).max()) + 1e-6
        np.testing.assert_allclose(
            np.asarray(v) / scale, np.asarray(ref) / scale, atol=2e-2,
            err_msg=jax.tree_util.keystr(k),
        )
        checked += 1
    assert checked == len(flat_p)
