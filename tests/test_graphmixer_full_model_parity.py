"""Full-model GraphMixer forward parity vs the PyTorch reference.

Same discipline as tests/test_tgat_full_model_parity.py: the reference's
sampler is injected with FIXED neighbor arrays (keyed by the requested K —
the link encoder asks for num_neighbors, the node encoder for time_gap),
weights are transplanted from our flax tree, and the (B, 172) outputs must
match to float32 tolerance. Covers the softmax-then-mean node-encoder quirk
(GraphMixer.py:119-137) and the unmasked token mean (GraphMixer.py:115).
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

from dyglib_tpu.models import FeatureTables  # noqa: E402
from dyglib_tpu.models.graphmixer import GraphMixerInputs, GraphMixerNet  # noqa: E402


class InjectedSampler:
    sample_neighbor_strategy = "recent"
    seed = 0

    def __init__(self, tables_by_k):
        self.tables_by_k = tables_by_k

    def get_historical_neighbors(self, node_ids, node_interact_times, num_neighbors):
        return self.tables_by_k[num_neighbors]


def _set_linear(tl, kernel, bias=None):
    with torch.no_grad():
        tl.weight.copy_(torch.from_numpy(np.asarray(kernel).T.copy()))
        if bias is not None:
            tl.bias.copy_(torch.from_numpy(np.asarray(bias).copy()))


def _set_norm(tn, scale, bias):
    with torch.no_grad():
        tn.weight.copy_(torch.from_numpy(np.asarray(scale).copy()))
        tn.bias.copy_(torch.from_numpy(np.asarray(bias).copy()))


def test_graphmixer_forward_parity():
    from models.GraphMixer import GraphMixer as RefGraphMixer

    rng = np.random.default_rng(1)
    n_nodes, n_edges, d = 60, 150, 172
    b, k, g, L = 9, 6, 12, 2
    node_feats = rng.normal(size=(n_nodes, d)).astype(np.float32)
    edge_feats = rng.normal(size=(n_edges, d)).astype(np.float32)
    node_feats[0] = 0.0
    edge_feats[0] = 0.0

    q_ids = rng.integers(1, n_nodes, size=(b,))
    q_ts = rng.integers(5000, 6000, size=(b,)).astype(np.float64)
    nbr_ids = rng.integers(0, n_nodes, size=(b, k))
    nbr_eids = np.where(nbr_ids == 0, 0, rng.integers(1, n_edges, size=(b, k)))
    nbr_ts = np.where(nbr_ids == 0, 0.0, rng.integers(1000, 4000, size=(b, k))).astype(np.float64)
    tg_ids = rng.integers(0, n_nodes, size=(b, g))
    tg_ids[0, :] = 0  # one all-padded row exercises the softmax guard
    tg_eids = np.where(tg_ids == 0, 0, rng.integers(1, n_edges, size=(b, g)))
    tg_ts = np.where(tg_ids == 0, 0.0, rng.integers(1000, 4000, size=(b, g))).astype(np.float64)

    # ---- ours (gather-mode node encoder = the reference layout)
    net = GraphMixerNet(
        time_feat_dim=100, num_tokens=k, num_layers=L, dropout=0.1, time_gap=g
    )
    tables = FeatureTables(node=jnp.asarray(node_feats), edge=jnp.asarray(edge_feats))
    inputs = GraphMixerInputs(
        query_ts=jnp.asarray(q_ts, jnp.int32),
        nbr_eids=jnp.asarray(nbr_eids, jnp.int32),
        nbr_ts=jnp.asarray(nbr_ts, jnp.int32),
        nbr_mask=jnp.asarray(nbr_ids != 0),
        node_ids=jnp.asarray(q_ids, jnp.int32),
        tg_ids=jnp.asarray(tg_ids, jnp.int32),
        tg_mask=jnp.asarray(tg_ids != 0),
    )
    params = net.init(jax.random.PRNGKey(0), tables, inputs)
    ours = np.asarray(net.apply(params, tables, inputs, train=False))

    # ---- reference with transplanted weights
    sampler = InjectedSampler({
        k: (nbr_ids, nbr_eids, nbr_ts),
        g: (tg_ids, tg_eids, tg_ts),
    })
    ref = RefGraphMixer(
        node_raw_features=node_feats, edge_raw_features=edge_feats,
        neighbor_sampler=sampler, time_feat_dim=100, num_tokens=k,
        num_layers=L, dropout=0.1,
    )
    p = params["params"]
    with torch.no_grad():
        ref.time_encoder.w.weight.copy_(
            torch.from_numpy(np.asarray(p["time_encoder"]["w"]).T.copy())
        )
        ref.time_encoder.w.bias.copy_(
            torch.from_numpy(np.asarray(p["time_encoder"]["b"]).copy())
        )
    _set_linear(
        ref.projection_layer,
        p["projection_layer"]["kernel"], p["projection_layer"]["bias"],
    )
    for i in range(L):
        mp = p[f"mlp_mixer_{i}"]
        mixer = ref.mlp_mixers[i]
        _set_norm(mixer.token_norm, mp["token_norm"]["scale"], mp["token_norm"]["bias"])
        _set_linear(mixer.token_feedforward.ffn[0], mp["token_ff"]["fc1"]["kernel"], mp["token_ff"]["fc1"]["bias"])
        _set_linear(mixer.token_feedforward.ffn[3], mp["token_ff"]["fc2"]["kernel"], mp["token_ff"]["fc2"]["bias"])
        _set_norm(mixer.channel_norm, mp["channel_norm"]["scale"], mp["channel_norm"]["bias"])
        _set_linear(mixer.channel_feedforward.ffn[0], mp["channel_ff"]["fc1"]["kernel"], mp["channel_ff"]["fc1"]["bias"])
        _set_linear(mixer.channel_feedforward.ffn[3], mp["channel_ff"]["fc2"]["kernel"], mp["channel_ff"]["fc2"]["bias"])
    _set_linear(ref.output_layer, p["output_layer"]["kernel"], p["output_layer"]["bias"])

    ref.eval()
    with torch.no_grad():
        theirs = ref.compute_node_temporal_embeddings(
            node_ids=q_ids, node_interact_times=q_ts,
            num_neighbors=k, time_gap=g,
        ).numpy()

    np.testing.assert_allclose(ours, theirs, atol=5e-4)
