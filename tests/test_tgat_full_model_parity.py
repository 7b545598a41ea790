"""Full-model TGAT forward parity vs the PyTorch reference.

The strongest parity check (BASELINE acceptance: per-layer allclose under
injected neighbor samples): the reference TGAT's sampler is monkeypatched to
return FIXED neighbor arrays, our TGATNet receives the same arrays as hop
tensors, weights are transplanted, and the (B, 172) output embeddings must
match to float32 tolerance across the full 2-layer recursion.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

from dyglib_tpu.models import FeatureTables, TGATInputs, TGATNet  # noqa: E402


class InjectedSampler:
    """Replays precomputed (ids, eids, times) per query batch, keyed by the
    flattened query size — matches the recursion's call pattern."""

    sample_neighbor_strategy = "recent"
    seed = 0

    def __init__(self, tables, k):
        self.tables = tables  # {num_queries: (ids, eids, times)}
        self.k = k

    def get_historical_neighbors(self, node_ids, node_interact_times, num_neighbors):
        ids, eids, times = self.tables[len(node_ids)]
        return ids, eids, times


def test_tgat_two_layer_forward_parity():
    from models.TGAT import TGAT as RefTGAT

    rng = np.random.default_rng(0)
    n_nodes, n_edges, d = 50, 120, 172
    b, k, L = 7, 5, 2
    node_feats = rng.normal(size=(n_nodes, d)).astype(np.float32)
    edge_feats = rng.normal(size=(n_edges, d)).astype(np.float32)
    node_feats[0] = 0.0
    edge_feats[0] = 0.0

    # fixed hop tensors (times strictly decreasing along hops, some pads)
    q_ids = rng.integers(1, n_nodes, size=(b,))
    q_ts = rng.integers(5000, 6000, size=(b,)).astype(np.float64)
    hop1_ids = rng.integers(0, n_nodes, size=(b, k))
    hop1_eids = np.where(hop1_ids == 0, 0, rng.integers(1, n_edges, size=(b, k)))
    hop1_ts = np.where(hop1_ids == 0, 0.0, rng.integers(1000, 4000, size=(b, k))).astype(np.float64)
    hop2_ids = rng.integers(0, n_nodes, size=(b * k, k))
    # hop-2 of padded hop-1 entries must itself be padding
    hop2_ids = np.where(hop1_ids.reshape(-1, 1) == 0, 0, hop2_ids)
    hop2_eids = np.where(hop2_ids == 0, 0, rng.integers(1, n_edges, size=(b * k, k)))
    hop2_ts = np.where(hop2_ids == 0, 0.0, rng.integers(0, 900, size=(b * k, k))).astype(np.float64)

    tables_by_size = {
        b: (hop1_ids, hop1_eids, hop1_ts),
        b * k: (hop2_ids, hop2_eids, hop2_ts),
    }

    # ---- ours
    net = TGATNet(time_feat_dim=100, num_layers=L, num_heads=2, dropout=0.1)
    tables = FeatureTables(node=jnp.asarray(node_feats), edge=jnp.asarray(edge_feats))
    inputs = TGATInputs(
        hop_ids=(
            jnp.asarray(q_ids, jnp.int32),
            jnp.asarray(hop1_ids, jnp.int32),
            jnp.asarray(hop2_ids.reshape(b, k * k), jnp.int32),
        ),
        hop_eids=(
            jnp.asarray(hop1_eids, jnp.int32),
            jnp.asarray(hop2_eids.reshape(b, k * k), jnp.int32),
        ),
        hop_ts=(
            jnp.asarray(q_ts, jnp.int32),
            jnp.asarray(hop1_ts, jnp.int32),
            jnp.asarray(hop2_ts.reshape(b, k * k), jnp.int32),
        ),
        hop_mask=(
            jnp.asarray(hop1_ids != 0),
            jnp.asarray(hop2_ids.reshape(b, k * k) != 0),
        ),
    )
    params = net.init(jax.random.PRNGKey(0), tables, inputs)
    ours = np.asarray(net.apply(params, tables, inputs, train=False))

    # ---- reference with transplanted weights
    ref = RefTGAT(
        node_raw_features=node_feats, edge_raw_features=edge_feats,
        neighbor_sampler=InjectedSampler(tables_by_size, k),
        time_feat_dim=100, num_layers=L, num_heads=2, dropout=0.1,
    )
    p = params["params"]

    def set_linear(tl, kernel, bias=None):
        with torch.no_grad():
            tl.weight.copy_(torch.from_numpy(np.asarray(kernel).T.copy()))
            if bias is not None:
                tl.bias.copy_(torch.from_numpy(np.asarray(bias).copy()))

    with torch.no_grad():
        ref.time_encoder.w.weight.copy_(
            torch.from_numpy(np.asarray(p["time_encoder"]["w"]).T.copy())
        )
        ref.time_encoder.w.bias.copy_(
            torch.from_numpy(np.asarray(p["time_encoder"]["b"]).copy())
        )
    for l in range(L):
        conv = ref.temporal_conv_layers[l]
        cp = p[f"temporal_conv_{l}"]
        set_linear(conv.query_projection, cp["query_projection"]["kernel"])
        set_linear(conv.key_projection, cp["key_projection"]["kernel"])
        set_linear(conv.value_projection, cp["value_projection"]["kernel"])
        set_linear(conv.residual_fc, cp["residual_fc"]["kernel"], cp["residual_fc"]["bias"])
        with torch.no_grad():
            conv.layer_norm.weight.copy_(torch.from_numpy(np.asarray(cp["layer_norm"]["scale"]).copy()))
            conv.layer_norm.bias.copy_(torch.from_numpy(np.asarray(cp["layer_norm"]["bias"]).copy()))
        mp = p[f"merge_{l}"]
        set_linear(ref.merge_layers[l].fc1, mp["fc1"]["kernel"], mp["fc1"]["bias"])
        set_linear(ref.merge_layers[l].fc2, mp["fc2"]["kernel"], mp["fc2"]["bias"])
    ref.eval()
    with torch.no_grad():
        theirs = ref.compute_node_temporal_embeddings(
            node_ids=q_ids, node_interact_times=q_ts,
            current_layer_num=L, num_neighbors=k,
        ).numpy()

    np.testing.assert_allclose(ours, theirs, atol=5e-4)
