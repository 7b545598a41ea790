"""Definitive CAWN stream-parity experiment: train OUR CAWN on the
REFERENCE'S exact walk stream.

CALIBRATION round 3 left a ~0.35-AP mean gap between our CAWN band and
the reference's, with forward, backward (gradient parity to 5e-7),
optimizer, init distributions, negatives, and the tia sampling
DISTRIBUTION all proven identical — leaving only "which draws occur"
(the stochastic stream). This script eliminates that final difference:
walk trees for every batch come from the reference NeighborSampler
itself (imported read-only from /root/reference, same RandomState
discipline as its own training loop: reset per epoch, sequential
draws), injected into our CAWNNet via a standalone train loop that
replicates LinkPredictionTrainer._forward's quad semantics. Negatives
come from the shared ReplayNegs stream.

If the resulting band matches the reference band, the residual gap is
PROVEN to be walk-stream luck; if it does not, something real remains.

Usage: python scripts/cawn_walk_replay.py [seed ...]   (default 0 1)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
sys.path.insert(0, "/root/reference")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from reference_calibration import CFG, EPOCHS, B, LR, ReplayNegs, get_data

from dyglib_tpu.models import CAWN, FeatureTables
from dyglib_tpu.models.cawn import CAWNInputs, _expand_to_walks
from dyglib_tpu.graph import build_temporal_csr
from dyglib_tpu.train.link_prediction import TrainConfig, make_optimizer
from dyglib_tpu.train.metrics import average_precision, roc_auc


def ref_walks(sampler, node_ids, ts, k, length):
    """Reference get_multi_hop_neighbors -> our hop-table layout."""
    ids, eids, times = sampler.get_multi_hop_neighbors(
        num_hops=length, node_ids=node_ids, node_interact_times=ts,
        num_neighbors=k,
    )
    return ids, eids, times


def build_inputs(sampler, src, dst, nsrc, ndst, ts, k, length):
    """CAWNInputs for the quad [src||dst||neg_src||neg_dst] with walk
    trees drawn by the REFERENCE sampler in its exact call order
    (src-tree then dst-tree per pair, positives then negatives — matching
    compute_src_dst_node_temporal_embeddings x2)."""
    groups = []
    for ids in (src, dst, nsrc, ndst):
        groups.append(ref_walks(sampler, ids, ts, k, length))
    m = 4 * len(src)
    w = k ** length
    hop_ids = [np.concatenate([src, dst, nsrc, ndst])[:, None]]
    hop_eids = [np.zeros((m, 1), np.int64)]
    hop_ts = [np.concatenate([ts] * 4)[:, None]]
    for h in range(length):
        hop_ids.append(np.concatenate([g[0][h] for g in groups]))
        hop_eids.append(np.concatenate([g[1][h] for g in groups]))
        hop_ts.append(np.concatenate([g[2][h] for g in groups]))
    walk_ids = jnp.stack(
        [_expand_to_walks(jnp.asarray(a, jnp.int32), w) for a in hop_ids],
        axis=2,
    )
    # times: our pipeline uses int32 keys; the synthetic data has integer
    # timestamps so ceil == exact
    return CAWNInputs(
        walk_ids=walk_ids,
        query_ts=jnp.asarray(np.concatenate([ts] * 4), jnp.int32),
        hop_ids=tuple(jnp.asarray(a, jnp.int32) for a in hop_ids),
        hop_eids=tuple(jnp.asarray(a, jnp.int32) for a in hop_eids),
        hop_ts=tuple(
            jnp.asarray(np.ceil(a).astype(np.int64), jnp.int32) for a in hop_ts
        ),
    )


def main():
    from utils.DataLoader import Data
    from utils.utils import get_neighbor_sampler

    seeds = [int(s) for s in sys.argv[1:]] or [0, 1]
    d = get_data()
    cfg = CFG["CAWN"]
    k, length = cfg["num_neighbors"], cfg["walk_length"]

    to_ref = lambda s: Data(s.src, s.dst, s.ts, s.eid, s.label)
    train_data, full_data = to_ref(d.train), to_ref(d.full)

    backbone = CAWN(num_neighbors=k, walk_length=length,
                    num_walk_heads=cfg["num_walk_heads"])
    tables = FeatureTables(
        node=jnp.asarray(d.node_raw_features.astype(np.float32)),
        edge=jnp.asarray(d.edge_raw_features.astype(np.float32)),
    )
    csr = build_temporal_csr(
        d.train, num_nodes=d.num_nodes, time_scaling_factor=1e-6,
        with_tia=True,
    )
    from dyglib_tpu.nn.modules import MergeLayer

    head = MergeLayer(hidden_dim=tables.node_dim, output_dim=1)
    tc = TrainConfig(batch_size=B, num_epochs=EPOCHS, learning_rate=LR)
    optim = make_optimizer(tc)

    @jax.jit
    def train_step(params, opt_state, inputs, valid, key):
        def loss_fn(p):
            embs = backbone.module.apply(
                p["backbone"], tables, inputs, train=True,
                rngs={"dropout": key},
            )
            b = valid.shape[0]
            s_e, d_e, ns_e, nd_e = jnp.split(embs, 4, axis=0)
            pos = head.apply(p["head"], s_e, d_e)[..., 0]
            neg = head.apply(p["head"], ns_e, nd_e)[..., 0]
            bce_p = optax.sigmoid_binary_cross_entropy(pos, jnp.ones_like(pos))
            bce_n = optax.sigmoid_binary_cross_entropy(neg, jnp.zeros_like(neg))
            return ((bce_p + bce_n) * valid).sum() / jnp.maximum(
                2.0 * valid.sum(), 1.0
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optim.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_step(params, inputs):
        embs = backbone.module.apply(params["backbone"], tables, inputs)
        s_e, d_e, ns_e, nd_e = jnp.split(embs, 4, axis=0)
        pos = jax.nn.sigmoid(head.apply(params["head"], s_e, d_e)[..., 0])
        neg = jax.nn.sigmoid(head.apply(params["head"], ns_e, nd_e)[..., 0])
        return pos, neg

    for seed in seeds:
        train_sampler = get_neighbor_sampler(
            train_data, "time_interval_aware", 1e-6, seed=0
        )
        full_sampler = get_neighbor_sampler(
            full_data, "time_interval_aware", 1e-6, seed=1
        )
        train_neg = ReplayNegs(train_data.src_node_ids,
                               train_data.dst_node_ids, seed=1000 + seed)
        val_neg = ReplayNegs(full_data.src_node_ids, full_data.dst_node_ids,
                             seed=0)

        key = jax.random.PRNGKey(seed)
        k_b, k_h = jax.random.split(key)
        # init through the adapter (identical tree)
        params = {
            "backbone": backbone.init(k_b, tables, csr),
            "head": head.init(
                k_h, jnp.zeros((1, tables.node_dim)),
                jnp.zeros((1, tables.node_dim)),
            ),
        }
        opt_state = optim.init(params)

        best = -1.0
        for epoch in range(EPOCHS):
            t0 = time.time()
            # reference per-epoch discipline: reset the train sampler's
            # RandomState (set_neighbor_sampler semantics)
            train_sampler.reset_random_state()
            tr = d.train
            losses = []
            for i, s in enumerate(range(0, len(tr.src), B)):
                e = min(s + B, len(tr.src))
                src, dst, ts = tr.src[s:e], tr.dst[s:e], tr.ts[s:e]
                _, ndst = train_neg.sample(e - s)
                inputs = build_inputs(
                    train_sampler, src, dst, src, ndst, ts, k, length
                )
                valid = jnp.ones((e - s,), jnp.float32)
                params, opt_state, loss = train_step(
                    params, opt_state, inputs, valid,
                    jax.random.fold_in(jax.random.PRNGKey(1 + seed), epoch * 10000 + i),
                )
                losses.append(float(loss))
            # eval on val with reference walks (full sampler, reset)
            full_sampler.reset_random_state()
            val_neg.reset_random_state()
            aps, aucs = [], []
            va = d.val
            for s in range(0, len(va.src), B):
                e = min(s + B, len(va.src))
                src, dst, ts = va.src[s:e], va.dst[s:e], va.ts[s:e]
                nsrc, ndst = val_neg.sample(e - s)
                inputs = build_inputs(
                    full_sampler, src, dst, nsrc, ndst, ts, k, length
                )
                pos, neg = eval_step(params, inputs)
                pred = np.r_[np.asarray(pos), np.asarray(neg)]
                lab = np.r_[np.ones(e - s), np.zeros(e - s)]
                aps.append(average_precision(lab, pred))
                aucs.append(roc_auc(lab, pred))
            ap = float(np.mean(aps))
            best = max(best, ap)
            print(
                f"  walk-replay s{seed} epoch {epoch+1}: loss "
                f"{np.mean(losses):.4f} val ap {ap:.4f} auc "
                f"{np.mean(aucs):.4f} ({time.time()-t0:.1f}s)",
                flush=True,
            )
        print(f"WALK-REPLAY ours s{seed} best val AP {best:.4f}", flush=True)


if __name__ == "__main__":
    main()
