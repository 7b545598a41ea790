"""Diagnostic: CAWN GRADIENT parity vs the torch reference on one
identical injected batch (no dropout, eval-mode walks).

Forward parity is already tested (tests/test_cawn_full_model_parity.py);
this probes the one thing transplant forward tests cannot see — the
backward — to decide whether the remaining CAWN calibration gap
(ours 0.9085 vs ref 0.9142, CALIBRATION round 3) is a gradient bug or a
stochastic-stream-level difference.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/reference")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import torch

import test_cawn_full_model_parity as T
from dyglib_tpu.models import FeatureTables
from dyglib_tpu.models.cawn import CAWNInputs, CAWNNet, _expand_to_walks

B, K, L = T.B, T.K, T.L


def main():
    from models.CAWN import CAWN as RefCAWN

    rng = np.random.default_rng(17)
    node_feats = rng.normal(size=(T.N_NODES, T.D)).astype(np.float32)
    edge_feats = rng.normal(size=(T.N_EDGES, T.D)).astype(np.float32)
    node_feats[0] = 0.0
    edge_feats[0] = 0.0
    pool = rng.integers(1, T.N_NODES, size=10)
    roles, targets = {}, {}
    ts = rng.integers(5000, 6000, size=(B,)).astype(np.float64)
    for name in ["src", "dst", "neg_src", "neg_dst"]:
        targets[name] = rng.integers(1, T.N_NODES, size=(B,))
        roles[name] = T._mk_tree(rng, ts, pool)

    order = ["src", "dst", "neg_src", "neg_dst"]
    w = K ** L
    hop_ids, hop_eids, hop_ts = [], [], []
    hop_ids.append(np.concatenate([targets[n] for n in order])[:, None])
    hop_eids.append(np.zeros((4 * B, 1), np.int64))
    hop_ts.append(np.concatenate([ts] * 4)[:, None])
    for st in range(L):
        hop_ids.append(np.concatenate([roles[n][0][st] for n in order]))
        hop_eids.append(np.concatenate([roles[n][1][st] for n in order]))
        hop_ts.append(np.concatenate([roles[n][2][st] for n in order]))
    walk_ids = jnp.stack(
        [_expand_to_walks(jnp.asarray(a, jnp.int32), w) for a in hop_ids],
        axis=2,
    )
    inputs = CAWNInputs(
        walk_ids=walk_ids,
        query_ts=jnp.asarray(np.concatenate([ts] * 4), jnp.int32),
        hop_ids=tuple(jnp.asarray(a, jnp.int32) for a in hop_ids),
        hop_eids=tuple(jnp.asarray(a, jnp.int32) for a in hop_eids),
        hop_ts=tuple(jnp.asarray(a, jnp.int32) for a in hop_ts),
    )
    net = CAWNNet(
        time_feat_dim=T.TIME_DIM, position_feat_dim=T.POS_DIM, walk_length=L,
        num_walk_heads=T.HEADS, dropout=0.1,
    )
    tables = FeatureTables(
        node=jnp.asarray(node_feats), edge=jnp.asarray(edge_feats)
    )
    params = net.init(jax.random.PRNGKey(0), tables, inputs)

    def loss_fn(p):
        out = net.apply(p, tables, inputs, train=False)
        return (out ** 2).sum() / out.size

    ours_loss, ours_grads = jax.value_and_grad(loss_fn)(params)
    og = ours_grads["params"]

    sampler = T.CallOrderSampler([roles[n] for n in order])
    ref = RefCAWN(
        node_raw_features=node_feats, edge_raw_features=edge_feats,
        neighbor_sampler=sampler, time_feat_dim=T.TIME_DIM,
        position_feat_dim=T.POS_DIM, walk_length=L, num_walk_heads=T.HEADS,
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
    T._set_linear(pel[0], p["position_fc1"]["kernel"], p["position_fc1"]["bias"])
    T._set_linear(pel[2], p["position_fc2"]["kernel"], p["position_fc2"]["bias"])
    T._transplant_bilstm(
        ref.walk_encoder.feature_encoder.bilstm_encoder, p["feature_encoder"]
    )
    T._transplant_bilstm(
        ref.walk_encoder.position_encoder.bilstm_encoder, p["position_encoder"]
    )
    T._set_linear(ref.walk_encoder.projection_layers[0],
                  p["projection_0"]["kernel"], p["projection_0"]["bias"])
    T._set_linear(ref.walk_encoder.projection_layers[1],
                  p["projection_1"]["kernel"], p["projection_1"]["bias"])
    T._transplant_transformer(
        ref.walk_encoder.transformer_encoder, p["walk_transformer"]
    )

    ref.eval()  # dropout off; grads still flow
    src_emb, dst_emb = ref.compute_src_dst_node_temporal_embeddings(
        src_node_ids=targets["src"], dst_node_ids=targets["dst"],
        node_interact_times=ts, num_neighbors=K,
    )
    nsrc_emb, ndst_emb = ref.compute_src_dst_node_temporal_embeddings(
        src_node_ids=targets["neg_src"], dst_node_ids=targets["neg_dst"],
        node_interact_times=ts, num_neighbors=K,
    )
    out_t = torch.cat([src_emb, dst_emb, nsrc_emb, ndst_emb])
    loss_t = (out_t ** 2).sum() / out_t.numel()
    loss_t.backward()
    print(f"loss ours {float(ours_loss):.6f} torch {float(loss_t):.6f}")

    def cmp(label, ours, theirs):
        a = np.asarray(ours)
        b = theirs.grad.detach().numpy() if theirs.grad is not None else None
        if b is None:
            print(f"{label:35s} torch grad None (ours |g|={np.abs(a).max():.2e})")
            return
        scale = max(np.abs(b).max(), 1e-9)
        rel = np.abs(a - b).max() / scale
        print(f"{label:35s} max|rel diff| {rel:.2e}  (|g| {scale:.2e})")

    cmp("time_encoder/w", og["time_encoder"]["w"].T,
        ref.time_encoder.w.weight)
    cmp("position_fc1/kernel", og["position_fc1"]["kernel"].T, pel[0].weight)
    cmp("position_fc2/kernel", og["position_fc2"]["kernel"].T, pel[2].weight)
    fe = ref.walk_encoder.feature_encoder.bilstm_encoder
    cmp("feature_encoder/fwd_wx", og["feature_encoder"]["fwd_wx"].T,
        fe.weight_ih_l0)
    cmp("feature_encoder/fwd_wh", og["feature_encoder"]["fwd_wh"].T,
        fe.weight_hh_l0)
    cmp("feature_encoder/fwd_b", og["feature_encoder"]["fwd_b"],
        fe.bias_ih_l0)
    cmp("feature_encoder/bwd_wx", og["feature_encoder"]["bwd_wx"].T,
        fe.weight_ih_l0_reverse)
    cmp("feature_encoder/bwd_b", og["feature_encoder"]["bwd_b"],
        fe.bias_ih_l0_reverse)
    cmp("projection_0/kernel", og["projection_0"]["kernel"].T,
        ref.walk_encoder.projection_layers[0].weight)
    cmp("projection_1/kernel", og["projection_1"]["kernel"].T,
        ref.walk_encoder.projection_layers[1].weight)
    te = ref.walk_encoder.transformer_encoder
    wt = og["walk_transformer"]
    inp = np.concatenate(
        [wt["q_proj"]["kernel"].T, wt["k_proj"]["kernel"].T,
         wt["v_proj"]["kernel"].T], axis=0,
    )
    cmp("walk_transformer/in_proj", inp, te.multi_head_attention.in_proj_weight)
    cmp("walk_transformer/out_proj", wt["out_proj"]["kernel"].T,
        te.multi_head_attention.out_proj.weight)
    cmp("walk_transformer/ffn1", wt["ffn1"]["kernel"].T, te.linear_layers[0].weight)
    cmp("walk_transformer/norm1", wt["norm1"]["scale"], te.norm_layers[0].weight)


if __name__ == "__main__":
    main()
