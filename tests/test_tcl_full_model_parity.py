"""Full-model TCL forward parity vs the PyTorch reference.

Same discipline as tests/test_tgat_full_model_parity.py: the reference's
sampler is injected with FIXED neighbor arrays (returned in call order:
src batch then dst batch), weights are transplanted from our flax tree,
and the (B, 172) src/dst outputs must match to float32 tolerance. Covers
the shared-per-layer self+cross attention (TCL.py:130-146), the learned
depth embeddings (TCL.py:41, 115-128), and the quad pairing/scatter in
our TCLNet (the quad [src||dst||neg_src||neg_dst] is embedded as 2B
(left, right) pairs).
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
from dyglib_tpu.models.tcl import TCLInputs, TCLNet  # noqa: E402


class CallOrderSampler:
    """Replays fixed (ids, eids, times) tables in call order."""

    sample_neighbor_strategy = "recent"
    seed = 0

    def __init__(self, tables):
        self.tables = list(tables)
        self.i = 0

    def get_historical_neighbors(self, node_ids, node_interact_times, num_neighbors):
        out = self.tables[self.i]
        self.i += 1
        return out


def _set_linear(tl, kernel, bias=None):
    with torch.no_grad():
        tl.weight.copy_(torch.from_numpy(np.asarray(kernel).T.copy()))
        if bias is not None:
            tl.bias.copy_(torch.from_numpy(np.asarray(bias).copy()))


def _transplant_transformer(ref_te, p):
    qk = np.asarray(p["q_proj"]["kernel"]).T
    kk = np.asarray(p["k_proj"]["kernel"]).T
    vk = np.asarray(p["v_proj"]["kernel"]).T
    with torch.no_grad():
        ref_te.multi_head_attention.in_proj_weight.copy_(
            torch.from_numpy(np.concatenate([qk, kk, vk], axis=0).copy())
        )
        ref_te.multi_head_attention.in_proj_bias.copy_(
            torch.from_numpy(
                np.concatenate(
                    [p["q_proj"]["bias"], p["k_proj"]["bias"], p["v_proj"]["bias"]]
                ).copy()
            )
        )
        ref_te.norm_layers[0].weight.copy_(
            torch.from_numpy(np.asarray(p["norm1"]["scale"]))
        )
        ref_te.norm_layers[0].bias.copy_(
            torch.from_numpy(np.asarray(p["norm1"]["bias"]))
        )
        ref_te.norm_layers[1].weight.copy_(
            torch.from_numpy(np.asarray(p["norm2"]["scale"]))
        )
        ref_te.norm_layers[1].bias.copy_(
            torch.from_numpy(np.asarray(p["norm2"]["bias"]))
        )
    _set_linear(ref_te.multi_head_attention.out_proj, p["out_proj"]["kernel"], p["out_proj"]["bias"])
    _set_linear(ref_te.linear_layers[0], p["ffn1"]["kernel"], p["ffn1"]["bias"])
    _set_linear(ref_te.linear_layers[1], p["ffn2"]["kernel"], p["ffn2"]["bias"])


def _mk_seq(rng, ids, ts, n_nodes, n_edges, k):
    """Fixed (B, K) neighbor tables with some pad rows (id 0)."""
    b = len(ids)
    nbr = rng.integers(0, n_nodes, size=(b, k))
    eid = np.where(nbr == 0, 0, rng.integers(1, n_edges, size=(b, k)))
    nts = np.where(nbr == 0, 0.0, rng.integers(1000, 4000, size=(b, k))).astype(np.float64)
    return nbr, eid, nts


def test_tcl_forward_parity():
    from models.TCL import TCL as RefTCL

    rng = np.random.default_rng(7)
    n_nodes, n_edges, d = 60, 150, 172
    b, k, L, h = 6, 5, 2, 2

    node_feats = rng.normal(size=(n_nodes, d)).astype(np.float32)
    edge_feats = rng.normal(size=(n_edges, d)).astype(np.float32)
    node_feats[0] = 0.0
    edge_feats[0] = 0.0

    src = rng.integers(1, n_nodes, size=(b,))
    dst = rng.integers(1, n_nodes, size=(b,))
    neg_src = rng.integers(1, n_nodes, size=(b,))
    neg_dst = rng.integers(1, n_nodes, size=(b,))
    ts = rng.integers(5000, 6000, size=(b,)).astype(np.float64)

    seqs = {
        name: _mk_seq(rng, ids, ts, n_nodes, n_edges, k)
        for name, ids in [
            ("src", src), ("dst", dst), ("neg_src", neg_src), ("neg_dst", neg_dst)
        ]
    }

    # ---- ours: one quad forward
    def cat(ids_list):
        return jnp.asarray(np.concatenate(ids_list), jnp.int32)

    quad_ids = [src, dst, neg_src, neg_dst]
    seq_ids = np.concatenate(
        [np.concatenate([ids[:, None], seqs[n][0]], axis=1)
         for n, ids in zip(["src", "dst", "neg_src", "neg_dst"], quad_ids)]
    )
    seq_eids = np.concatenate(
        [np.concatenate([np.zeros((b, 1), np.int64), seqs[n][1]], axis=1)
         for n in ["src", "dst", "neg_src", "neg_dst"]]
    )
    seq_ts = np.concatenate(
        [np.concatenate([ts[:, None], seqs[n][2]], axis=1)
         for n in ["src", "dst", "neg_src", "neg_dst"]]
    )
    net = TCLNet(
        time_feat_dim=100, num_layers=L, num_heads=h, num_depths=k + 1, dropout=0.1
    )
    tables = FeatureTables(node=jnp.asarray(node_feats), edge=jnp.asarray(edge_feats))
    inputs = TCLInputs(
        seq_ids=jnp.asarray(seq_ids, jnp.int32),
        seq_eids=jnp.asarray(seq_eids, jnp.int32),
        seq_ts=jnp.asarray(seq_ts, jnp.int32),
        query_ts=cat([ts, ts, ts, ts]),
    )
    params = net.init(jax.random.PRNGKey(0), tables, inputs)
    ours = np.asarray(net.apply(params, tables, inputs, train=False))

    # ---- reference: two pair forwards with transplanted weights
    p = params["params"]
    sampler = CallOrderSampler([
        seqs["src"], seqs["dst"], seqs["neg_src"], seqs["neg_dst"]
    ])
    ref = RefTCL(
        node_raw_features=node_feats, edge_raw_features=edge_feats,
        neighbor_sampler=sampler, time_feat_dim=100, num_layers=L,
        num_heads=h, num_depths=k + 1, dropout=0.1,
    )
    with torch.no_grad():
        ref.time_encoder.w.weight.copy_(
            torch.from_numpy(np.asarray(p["time_encoder"]["w"]).T.copy())
        )
        ref.time_encoder.w.bias.copy_(
            torch.from_numpy(np.asarray(p["time_encoder"]["b"]).copy())
        )
        ref.depth_embedding.weight.copy_(
            torch.from_numpy(np.asarray(p["depth_embedding"]["embedding"]).copy())
        )
    _set_linear(ref.projection_layer["node"], p["proj_node"]["kernel"], p["proj_node"]["bias"])
    _set_linear(ref.projection_layer["edge"], p["proj_edge"]["kernel"], p["proj_edge"]["bias"])
    _set_linear(ref.projection_layer["time"], p["proj_time"]["kernel"], p["proj_time"]["bias"])
    for i in range(L):
        _transplant_transformer(ref.transformers[i], p[f"transformer_{i}"])
    _set_linear(ref.output_layer, p["output_layer"]["kernel"], p["output_layer"]["bias"])

    ref.eval()
    with torch.no_grad():
        src_emb, dst_emb = ref.compute_src_dst_node_temporal_embeddings(
            src_node_ids=src, dst_node_ids=dst,
            node_interact_times=ts, num_neighbors=k,
        )
        nsrc_emb, ndst_emb = ref.compute_src_dst_node_temporal_embeddings(
            src_node_ids=neg_src, dst_node_ids=neg_dst,
            node_interact_times=ts, num_neighbors=k,
        )
    theirs = np.concatenate(
        [src_emb.numpy(), dst_emb.numpy(), nsrc_emb.numpy(), ndst_emb.numpy()]
    )
    np.testing.assert_allclose(ours, theirs, atol=5e-4)
