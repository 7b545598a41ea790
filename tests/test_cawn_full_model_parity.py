"""Full-model CAWN forward parity vs the PyTorch reference.

The reference's sampler is injected with FIXED multi-hop walk trees
(call order: src, dst, neg_src, neg_dst), weights are transplanted from
our flax tree, and the (B, 172) outputs must match to float32 tolerance.
Covers the position encoder's landing-probability counts over BOTH trees
(string-keyed dict, CAWN.py:197-289, vs our fused equality-reduce at hop
granularity), the packed-BiLSTM read-at-last-valid-position semantics
(CAWN.py:358-396 vs our tree-factored forward scan + one backward-cell
step), the attention-dim rounding quirk (CAWN.py:307-313), and the shared
post-LN transformer over walks.

Walk trees are prefix-valid (children of pads are pads) with overlapping
node pools so co-occurrence counts are nontrivial; walk_length=2
exercises the full tree recursion.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(REF), reason="reference checkout not available"
    ),
    pytest.mark.slow,  # heavyweight tier (see pytest.ini)
]
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

from dyglib_tpu.models import FeatureTables  # noqa: E402
from dyglib_tpu.models.cawn import (  # noqa: E402
    CAWNInputs,
    CAWNNet,
    _expand_to_walks,
)

B, K, L = 3, 3, 2
N_NODES, N_EDGES, D = 50, 120, 172
TIME_DIM, POS_DIM, HEADS = 100, 172, 8


class CallOrderSampler:
    sample_neighbor_strategy = "time_interval_aware"
    seed = 0

    def __init__(self, trees):
        self.trees = list(trees)
        self.i = 0

    def get_multi_hop_neighbors(self, num_hops, node_ids, node_interact_times, num_neighbors):
        ids, eids, ts = self.trees[self.i]
        self.i += 1
        return (
            [a.copy() for a in ids],
            [a.copy() for a in eids],
            [a.copy() for a in ts],
        )


def _set_linear(tl, kernel, bias=None):
    with torch.no_grad():
        tl.weight.copy_(torch.from_numpy(np.asarray(kernel).T.copy()))
        if bias is not None:
            tl.bias.copy_(torch.from_numpy(np.asarray(bias).copy()))


def _transplant_bilstm(torch_lstm, p):
    """Our fused-gate tree BiLSTM params -> torch bidirectional nn.LSTM.

    Gate order matches ([i, f, g, o]); both torch bias vectors map
    directly (ours keeps b_ih and b_hh separate for init-distribution
    parity). The backward recurrent kernel only influences
    positions the read-at-last-valid never observes (the read position is
    the FIRST step of torch's reverse scan, h0 = 0), so any value matches;
    we copy ours for cleanliness."""
    with torch.no_grad():
        torch_lstm.weight_ih_l0.copy_(
            torch.from_numpy(np.asarray(p["fwd_wx"]).T.copy())
        )
        torch_lstm.weight_hh_l0.copy_(
            torch.from_numpy(np.asarray(p["fwd_wh"]).T.copy())
        )
        torch_lstm.bias_ih_l0.copy_(torch.from_numpy(np.asarray(p["fwd_b"]).copy()))
        torch_lstm.bias_hh_l0.copy_(torch.from_numpy(np.asarray(p["fwd_bh"]).copy()))
        torch_lstm.weight_ih_l0_reverse.copy_(
            torch.from_numpy(np.asarray(p["bwd_wx"]).T.copy())
        )
        torch_lstm.weight_hh_l0_reverse.copy_(
            torch.from_numpy(np.asarray(p["bwd_wh"]).T.copy())
        )
        torch_lstm.bias_ih_l0_reverse.copy_(
            torch.from_numpy(np.asarray(p["bwd_b"]).copy())
        )
        torch_lstm.bias_hh_l0_reverse.copy_(
            torch.from_numpy(np.asarray(p["bwd_bh"]).copy())
        )


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
        ref_te.norm_layers[0].weight.copy_(torch.from_numpy(np.asarray(p["norm1"]["scale"]).copy()))
        ref_te.norm_layers[0].bias.copy_(torch.from_numpy(np.asarray(p["norm1"]["bias"]).copy()))
        ref_te.norm_layers[1].weight.copy_(torch.from_numpy(np.asarray(p["norm2"]["scale"]).copy()))
        ref_te.norm_layers[1].bias.copy_(torch.from_numpy(np.asarray(p["norm2"]["bias"]).copy()))
    _set_linear(ref_te.multi_head_attention.out_proj, p["out_proj"]["kernel"], p["out_proj"]["bias"])
    _set_linear(ref_te.linear_layers[0], p["ffn1"]["kernel"], p["ffn1"]["bias"])
    _set_linear(ref_te.linear_layers[1], p["ffn2"]["kernel"], p["ffn2"]["bias"])


def _mk_tree(rng, ts, pool):
    """Prefix-valid (h1, h2) tree with pads and pool-overlapping ids."""
    h1 = np.where(
        rng.random((B, K)) < 0.25, 0, rng.choice(pool, size=(B, K))
    ).astype(np.int64)
    h1_eid = np.where(h1 == 0, 0, rng.integers(1, N_EDGES, size=(B, K))).astype(np.int64)
    h1_ts = np.where(h1 == 0, 0.0, rng.integers(1000, 4000, size=(B, K))).astype(np.float64)
    h2 = np.where(
        rng.random((B, K * K)) < 0.3, 0, rng.choice(pool, size=(B, K * K))
    ).astype(np.int64)
    h2 = np.where(np.repeat(h1, K, axis=1) == 0, 0, h2)
    h2_eid = np.where(h2 == 0, 0, rng.integers(1, N_EDGES, size=(B, K * K))).astype(np.int64)
    h2_ts = np.where(h2 == 0, 0.0, rng.integers(100, 900, size=(B, K * K))).astype(np.float64)
    return [h1, h2], [h1_eid, h2_eid], [h1_ts, h2_ts]


def test_cawn_forward_parity():
    from models.CAWN import CAWN as RefCAWN

    rng = np.random.default_rng(17)
    node_feats = rng.normal(size=(N_NODES, D)).astype(np.float32)
    edge_feats = rng.normal(size=(N_EDGES, D)).astype(np.float32)
    node_feats[0] = 0.0
    edge_feats[0] = 0.0

    pool = rng.integers(1, N_NODES, size=10)
    roles = {}
    targets = {}
    ts = rng.integers(5000, 6000, size=(B,)).astype(np.float64)
    for name in ["src", "dst", "neg_src", "neg_dst"]:
        targets[name] = rng.integers(1, N_NODES, size=(B,))
        roles[name] = _mk_tree(rng, ts, pool)

    # ---- ours: one quad forward
    order = ["src", "dst", "neg_src", "neg_dst"]
    w = K**L
    hop_ids, hop_eids, hop_ts = [], [], []
    # st = 0: targets
    hop_ids.append(np.concatenate([targets[n] for n in order])[:, None])
    hop_eids.append(np.zeros((4 * B, 1), np.int64))
    hop_ts.append(np.concatenate([ts] * 4)[:, None])
    for st in range(L):
        hop_ids.append(np.concatenate([roles[n][0][st] for n in order]))
        hop_eids.append(np.concatenate([roles[n][1][st] for n in order]))
        hop_ts.append(np.concatenate([roles[n][2][st] for n in order]))

    walk_ids = jnp.stack(
        [_expand_to_walks(jnp.asarray(a, jnp.int32), w) for a in hop_ids], axis=2
    )
    inputs = CAWNInputs(
        walk_ids=walk_ids,
        query_ts=jnp.asarray(np.concatenate([ts] * 4), jnp.int32),
        hop_ids=tuple(jnp.asarray(a, jnp.int32) for a in hop_ids),
        hop_eids=tuple(jnp.asarray(a, jnp.int32) for a in hop_eids),
        hop_ts=tuple(jnp.asarray(a, jnp.int32) for a in hop_ts),
    )
    net = CAWNNet(
        time_feat_dim=TIME_DIM, position_feat_dim=POS_DIM, walk_length=L,
        num_walk_heads=HEADS, dropout=0.1,
    )
    tables = FeatureTables(node=jnp.asarray(node_feats), edge=jnp.asarray(edge_feats))
    params = net.init(jax.random.PRNGKey(0), tables, inputs)
    ours = np.asarray(net.apply(params, tables, inputs, train=False))

    # ---- reference with transplanted weights
    sampler = CallOrderSampler([roles[n] for n in order])
    ref = RefCAWN(
        node_raw_features=node_feats, edge_raw_features=edge_feats,
        neighbor_sampler=sampler, time_feat_dim=TIME_DIM,
        position_feat_dim=POS_DIM, walk_length=L, num_walk_heads=HEADS,
        dropout=0.1,
    )
    p = params["params"]
    with torch.no_grad():
        ref.time_encoder.w.weight.copy_(
            torch.from_numpy(np.asarray(p["time_encoder"]["w"]).T.copy())
        )
        ref.time_encoder.w.bias.copy_(
            torch.from_numpy(np.asarray(p["time_encoder"]["b"]).copy())
        )
    pel = ref.position_encoder.position_encode_layer
    _set_linear(pel[0], p["position_fc1"]["kernel"], p["position_fc1"]["bias"])
    _set_linear(pel[2], p["position_fc2"]["kernel"], p["position_fc2"]["bias"])
    _transplant_bilstm(ref.walk_encoder.feature_encoder.bilstm_encoder, p["feature_encoder"])
    _transplant_bilstm(ref.walk_encoder.position_encoder.bilstm_encoder, p["position_encoder"])
    _set_linear(ref.walk_encoder.projection_layers[0], p["projection_0"]["kernel"], p["projection_0"]["bias"])
    _set_linear(ref.walk_encoder.projection_layers[1], p["projection_1"]["kernel"], p["projection_1"]["bias"])
    _transplant_transformer(ref.walk_encoder.transformer_encoder, p["walk_transformer"])

    ref.eval()
    with torch.no_grad():
        src_emb, dst_emb = ref.compute_src_dst_node_temporal_embeddings(
            src_node_ids=targets["src"], dst_node_ids=targets["dst"],
            node_interact_times=ts, num_neighbors=K,
        )
        nsrc_emb, ndst_emb = ref.compute_src_dst_node_temporal_embeddings(
            src_node_ids=targets["neg_src"], dst_node_ids=targets["neg_dst"],
            node_interact_times=ts, num_neighbors=K,
        )
    theirs = np.concatenate(
        [src_emb.numpy(), dst_emb.numpy(), nsrc_emb.numpy(), ndst_emb.numpy()]
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-3)
