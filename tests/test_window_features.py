"""Window-fetch feature path (csr.feat_entry) == per-row gather path.

The 'recent' strategy's sampled indices are the contiguous range
[hi-k, hi); fetch_entry_windows streams those rows from the entry-ordered
feature table. After masking, the fetched features must be BIT-IDENTICAL
to tables.node[blk.nbr] / tables.edge[blk.eid] (invalid entries = the
id-0 zero rows), across both hops including negative window bases and
empty windows — and TGAT's output must not change when the path is on.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dyglib_tpu.graph.csr import build_temporal_csr
from dyglib_tpu.graph.sampler import fetch_entry_windows, sample_multi_hop
from dyglib_tpu.models import FeatureTables, TGAT


@pytest.fixture(scope="module")
def setup(link_data):
    d = link_data
    fex = (d.node_raw_features, d.edge_raw_features)
    csr = build_temporal_csr(d.train, num_nodes=d.num_nodes, feat_entry_of=fex)
    tables = FeatureTables(
        node=jnp.asarray(d.node_raw_features),
        edge=jnp.asarray(d.edge_raw_features),
    )
    return d, csr, tables


def test_window_features_match_gathers(setup):
    d, csr, tables = setup
    k, hops = 7, 2
    b = 64
    ids = jnp.asarray(d.train.src[:b], jnp.int32)
    # include early times (tiny/empty windows, negative bases)
    ts = jnp.asarray(
        np.r_[d.train.ts[: b // 2], d.train.ts[-(b - b // 2) :]], jnp.int32
    )
    blocks, wins = sample_multi_hop(
        csr, ids, ts, k, hops, "recent", None, return_windows=True
    )
    assert wins is not None and len(wins) == hops
    dn = csr.feat_entry_node_dim
    de = csr.feat_entry_edge_dim
    for blk, win in zip(blocks, wins):
        w = fetch_entry_windows(csr, win, k)
        w = jnp.where(blk.mask[..., None], w, 0.0)
        np.testing.assert_array_equal(
            np.asarray(w[..., :dn]), np.asarray(tables.node[blk.nbr])
        )
        # the lane dim is zero-padded to the 128 tiling: edge features are
        # columns [dn, dn+de) and the pad columns are all-zero
        np.testing.assert_array_equal(
            np.asarray(w[..., dn : dn + de]), np.asarray(tables.edge[blk.eid])
        )
        assert float(jnp.abs(w[..., dn + de :]).max(initial=0.0)) == 0.0


def test_stochastic_strategy_returns_no_windows(setup):
    d, csr, _ = setup
    ids = jnp.asarray(d.train.src[:8], jnp.int32)
    ts = jnp.asarray(d.train.ts[:8], jnp.int32)
    _, wins = sample_multi_hop(
        csr, ids, ts, 4, 1, "uniform", jax.random.PRNGKey(0), return_windows=True
    )
    assert wins is None


def test_tgat_output_identical_with_window_path(setup, link_data):
    # use_window_attention=False: this test pins the window FETCH path
    # (bit-identical to row gathers); the fused window-attention kernel
    # uses bf16 MXU passes and has its own tolerance-based parity tests
    # (tests/test_window_attention.py)
    d, csr, tables = setup
    csr_plain = build_temporal_csr(d.train, num_nodes=d.num_nodes)
    m = TGAT(num_neighbors=5, num_layers=2, use_window_attention=False)
    params = m.init(jax.random.PRNGKey(0), tables, csr_plain)
    b = 32
    ids = jnp.asarray(d.train.src[:b], jnp.int32)
    ts = jnp.asarray(d.train.ts[:b], jnp.int32)
    key = jax.random.PRNGKey(1)
    in_plain = m.sample(csr_plain, ids, ts, key)
    in_win = m.sample(csr, ids, ts, key)
    assert in_plain.hop_node_feat is None
    assert in_win.hop_node_feat is not None
    out_plain = m.apply(params, tables, in_plain)
    out_win = m.apply(params, tables, in_win)
    np.testing.assert_array_equal(np.asarray(out_plain), np.asarray(out_win))
