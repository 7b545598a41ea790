"""End-metric calibration: REFERENCE (torch CPU, imported from
/root/reference — oracle only, never vendored) vs dyglib_tpu, every
trainable model family, same synthetic dataset and protocol.

For each model: 3 training epochs at lr=1e-3, B=200, small
reference-shaped configs; report per-epoch val AP/AUC for both sides and
the best-epoch values. Negative-sampler RNG streams differ across
frameworks (SURVEY §7 RNG-parity plan), so the comparison is a BAND, not
an equality — the recorded bands go to BASELINE.md and set the thresholds
of the end-to-end tests.

Noise control (the comparison is only as good as its variance):
  * train AND eval negative edges come from a shared deterministic replay
    stream consumed identically by both frameworks (same draws per batch),
    so metric differences are never "different negatives";
  * CAL_SEEDS independent (init, dropout, sampler) seeds per side, band =
    mean +- spread of the per-seed best val AP;
  * 6000-edge dataset -> ~900 val edges per eval.

Usage: python scripts/reference_calibration.py [model ...]
  (default: all of JODIE DyRep TGN TGAT TCL GraphMixer DyGFormer CAWN)
Env: CAL_EPOCHS (default 8), CAL_SEEDS (default 2), CAL_JSON (path to
write the band table as JSON).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")

import numpy as np
import torch
import torch.nn as nn

ROOT = "/tmp/refcal6k"
EPOCHS = int(os.environ.get("CAL_EPOCHS", "8"))
NUM_SEEDS = int(os.environ.get("CAL_SEEDS", "2"))
B, LR = 200, 1e-3
# CAL_DROPOUT: override both sides' dropout (diagnostic — with 0.0 the
# only cross-side training difference left is the init draw stream)
DROPOUT = float(os.environ.get("CAL_DROPOUT", "0.1"))


class ReplayNegs:
    """Deterministic negative-edge stream shared across frameworks.

    Mirrors the reference random strategy (sample src and dst uniformly
    from the split's unique ids, utils/utils.py:351-376) but from a
    framework-neutral numpy stream, so ref and ours score the SAME
    negative edges batch for batch.
    """

    negative_sample_strategy = "random"

    def __init__(self, src_ids, dst_ids, seed):
        self._src = np.sort(np.unique(np.asarray(src_ids)))
        self._dst = np.sort(np.unique(np.asarray(dst_ids)))
        self.seed = seed
        self.reset_random_state()

    def reset_random_state(self):
        self._rs = np.random.RandomState(self.seed)

    def sample(self, size, **_):
        return (
            self._rs.choice(self._src, size=size),
            self._rs.choice(self._dst, size=size),
        )
# small reference-shaped configs (CPU reference is the bottleneck)
CFG = {
    "JODIE": dict(num_neighbors=10, num_layers=1),
    "DyRep": dict(num_neighbors=10, num_layers=1),
    "TGN": dict(num_neighbors=10, num_layers=1),
    "TGAT": dict(num_neighbors=10, num_layers=2),
    "TCL": dict(num_neighbors=10, num_layers=2),
    "GraphMixer": dict(num_neighbors=10, num_layers=2),
    "DyGFormer": dict(max_input_sequence_length=16, patch_size=1, num_layers=2),
    "CAWN": dict(num_neighbors=8, walk_length=1, num_walk_heads=8),
}


def get_data():
    from dyglib_tpu.data import get_link_prediction_data, write_synthetic_dataset

    if not os.path.exists(os.path.join(ROOT, "s")):
        write_synthetic_dataset(
            ROOT, "s", num_src=120, num_dst=60, num_edges=6000,
            node_feat_scale=1.0, seed=7,
        )
    return get_link_prediction_data("s", data_root=ROOT)


def run_reference(name, d, seed=0, return_model=False):
    from models.CAWN import CAWN
    from models.DyGFormer import DyGFormer
    from models.GraphMixer import GraphMixer
    from models.MemoryModel import MemoryModel, compute_src_dst_node_time_shifts
    from models.modules import MergeLayer
    from models.TCL import TCL
    from models.TGAT import TGAT
    from utils.DataLoader import Data
    from utils.utils import NegativeEdgeSampler, get_neighbor_sampler

    from dyglib_tpu.train.metrics import average_precision, roc_auc

    cfg = CFG[name]
    to_ref = lambda s: Data(s.src, s.dst, s.ts, s.eid, s.label)
    train_data, full_data = to_ref(d.train), to_ref(d.full)
    strategy = "time_interval_aware" if name == "CAWN" else "recent"
    # time_scaling_factor=1e-6 matches BOTH our side's TrainConfig default
    # and the reference's own best-config value for CAWN
    # (load_configs.py:121-133). Round-2 ran the ref side at the
    # get_neighbor_sampler DEFAULT 0.0 (rank-based tia weights) while ours
    # trained at 1e-6 — the two sides sampled from different tia
    # distributions, which is exactly the kind of artifact the CAWN "-0.95
    # AP deficit" investigation (VERDICT r2 #2) had to rule out.
    train_sampler = get_neighbor_sampler(train_data, strategy, 1e-6, seed=0)
    full_sampler = get_neighbor_sampler(full_data, strategy, 1e-6, seed=1)
    train_neg = ReplayNegs(train_data.src_node_ids, train_data.dst_node_ids,
                           seed=1000 + seed)
    val_neg = ReplayNegs(full_data.src_node_ids, full_data.dst_node_ids, seed=0)

    torch.manual_seed(seed)
    np.random.seed(seed)
    nf = d.node_raw_features.astype(np.float32)
    ef = d.edge_raw_features.astype(np.float32)
    common = dict(node_raw_features=nf, edge_raw_features=ef,
                  neighbor_sampler=train_sampler, time_feat_dim=100,
                  dropout=DROPOUT)
    if name in ("JODIE", "DyRep", "TGN"):
        sm, ss, dm, ds_ = compute_src_dst_node_time_shifts(
            train_data.src_node_ids, train_data.dst_node_ids,
            train_data.node_interact_times,
        )
        backbone = MemoryModel(
            **common, model_name=name, num_layers=cfg["num_layers"], num_heads=2,
            src_node_mean_time_shift=sm, src_node_std_time_shift=ss,
            dst_node_mean_time_shift_dst=dm, dst_node_std_time_shift=ds_,
        )
    elif name == "TGAT":
        backbone = TGAT(**common, num_layers=cfg["num_layers"], num_heads=2)
    elif name == "TCL":
        backbone = TCL(**common, num_layers=cfg["num_layers"], num_heads=2,
                       num_depths=cfg["num_neighbors"] + 1)
    elif name == "GraphMixer":
        backbone = GraphMixer(**common, num_tokens=cfg["num_neighbors"],
                              num_layers=cfg["num_layers"])
    elif name == "DyGFormer":
        backbone = DyGFormer(
            **common, channel_embedding_dim=50, patch_size=cfg["patch_size"],
            num_layers=cfg["num_layers"], num_heads=2,
            max_input_sequence_length=cfg["max_input_sequence_length"],
        )
    elif name == "CAWN":
        backbone = CAWN(**common, position_feat_dim=172,
                        walk_length=cfg["walk_length"],
                        num_walk_heads=cfg["num_walk_heads"])
    head = MergeLayer(172, 172, 172, 1)
    model = nn.Sequential(backbone, head)
    opt = torch.optim.Adam(model.parameters(), lr=LR)
    bce = nn.BCELoss()
    K = cfg.get("num_neighbors", 10)
    is_memory = name in ("JODIE", "DyRep", "TGN")

    def embed(src, dst, ts, eid, positive):
        if is_memory:
            return backbone.compute_src_dst_node_temporal_embeddings(
                src, dst, ts, eid if positive else None,
                edges_are_positive=positive, num_neighbors=K,
            )
        if name == "GraphMixer":
            return backbone.compute_src_dst_node_temporal_embeddings(
                src, dst, ts, num_neighbors=K, time_gap=50,
            )
        if name == "DyGFormer":
            return backbone.compute_src_dst_node_temporal_embeddings(src, dst, ts)
        return backbone.compute_src_dst_node_temporal_embeddings(
            src, dst, ts, num_neighbors=K,
        )

    def eval_split(stream, neg):
        model.eval()
        neg.reset_random_state()
        aps, aucs = [], []
        with torch.no_grad():
            for s in range(0, len(stream.src), B):
                e = min(s + B, len(stream.src))
                src, dst, ts = stream.src[s:e], stream.dst[s:e], stream.ts[s:e]
                eid = stream.eid[s:e]
                # reference random-strategy protocol: discard sampled neg_src,
                # score (src, neg_dst) (evaluate_models_utils.py:61-63)
                _, ndst = neg.sample(e - s)
                nsrc = src
                if is_memory:
                    nse, nde = embed(nsrc, ndst, ts, None, False)
                    se, de = embed(src, dst, ts, eid, True)
                else:
                    se, de = embed(src, dst, ts, eid, True)
                    nse, nde = embed(nsrc, ndst, ts, None, False)
                pp = head(se, de).squeeze(-1).sigmoid().numpy()
                npb = head(nse, nde).squeeze(-1).sigmoid().numpy()
                pred = np.r_[pp, npb]
                lab = np.r_[np.ones(e - s), np.zeros(e - s)]
                aps.append(average_precision(lab, pred))
                aucs.append(roc_auc(lab, pred))
        return float(np.mean(aps)), float(np.mean(aucs))

    ap_by_epoch = []
    for epoch in range(EPOCHS):
        model.train()
        if name not in ("JODIE",):
            backbone.set_neighbor_sampler(train_sampler)
        if is_memory:
            backbone.memory_bank.__init_memory_bank__()
        t0 = time.time()
        losses = []
        tr = d.train
        for s in range(0, len(tr.src), B):
            e = min(s + B, len(tr.src))
            src, dst, ts, eid = tr.src[s:e], tr.dst[s:e], tr.ts[s:e], tr.eid[s:e]
            _, ndst = train_neg.sample(e - s)
            if is_memory:
                nse, nde = embed(src, ndst, ts, None, False)
                se, de = embed(src, dst, ts, eid, True)
            else:
                se, de = embed(src, dst, ts, eid, True)
                nse, nde = embed(src, ndst, ts, None, False)
            pp = head(se, de).squeeze(-1).sigmoid()
            npb = head(nse, nde).squeeze(-1).sigmoid()
            loss = bce(
                torch.cat([pp, npb]),
                torch.cat([torch.ones_like(pp), torch.zeros_like(npb)]),
            )
            opt.zero_grad()
            loss.backward()
            opt.step()
            if is_memory:
                backbone.memory_bank.detach_memory_bank()
            losses.append(loss.item())
        if name not in ("JODIE",):
            backbone.set_neighbor_sampler(full_sampler)
        if is_memory:
            # end-of-train memory snapshot (consumed by
            # eval_arm_calibration.py; the val eval below advances memory
            # past val time)
            post_train_memory = backbone.memory_bank.backup_memory_bank()
        ap, auc = eval_split(d.val, val_neg)
        ap_by_epoch.append(ap)
        print(
            f"  ref  s{seed} epoch {epoch+1}: loss {np.mean(losses):.4f} "
            f"val ap {ap:.4f} auc {auc:.4f} ({time.time()-t0:.1f}s)",
            flush=True,
        )
    if return_model:
        return ap_by_epoch, dict(
            backbone=backbone, head=head, model=model, embed=embed,
            eval_split=eval_split, is_memory=is_memory,
            full_sampler=full_sampler,
            post_train_memory=post_train_memory if is_memory else None,
        )
    return ap_by_epoch


def run_ours(name, d, seed=0, return_model=False):
    import jax

    from dyglib_tpu.graph import NegativeEdgeSampler
    from dyglib_tpu.models import (
        CAWN, DyGFormer, GraphMixer, MemoryModel, TCL, TGAT,
        compute_src_dst_node_time_shifts,
    )
    from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig

    cfg = CFG[name]
    if name in ("JODIE", "DyRep", "TGN"):
        shifts = compute_src_dst_node_time_shifts(d.train.src, d.train.dst, d.train.ts)
        bk = MemoryModel(model_name=name, num_neighbors=cfg["num_neighbors"],
                         num_layers=cfg["num_layers"], time_shifts=shifts,
                         dropout=DROPOUT)
    elif name == "TGAT":
        bk = TGAT(num_neighbors=cfg["num_neighbors"], num_layers=cfg["num_layers"])
    elif name == "TCL":
        bk = TCL(num_neighbors=cfg["num_neighbors"], num_layers=cfg["num_layers"])
    elif name == "GraphMixer":
        bk = GraphMixer(num_neighbors=cfg["num_neighbors"],
                        num_layers=cfg["num_layers"], time_gap=50)
    elif name == "DyGFormer":
        bk = DyGFormer(max_input_sequence_length=cfg["max_input_sequence_length"],
                       patch_size=cfg["patch_size"], num_layers=cfg["num_layers"])
    elif name == "CAWN":
        bk = CAWN(num_neighbors=cfg["num_neighbors"],
                  walk_length=cfg["walk_length"],
                  num_walk_heads=cfg["num_walk_heads"])
    tr = LinkPredictionTrainer(
        bk, d, TrainConfig(batch_size=B, num_epochs=EPOCHS, learning_rate=LR),
        os.path.join(ROOT, "ours.pkl"),
    )
    # shared replay streams (see ReplayNegs): identical draws to the ref run
    tr.train_neg = ReplayNegs(d.train.src, d.train.dst, seed=1000 + seed)
    val_neg = ReplayNegs(d.full.src, d.full.dst, seed=0)
    params, opt_state = tr.init_params(seed)
    state = tr.init_state()
    ap_by_epoch = []
    # CAL_FIXED_EPOCH_KEY=1: reuse one root key across epochs — diagnostic
    # replicating the reference's per-epoch sampler RNG reset
    # (set_neighbor_sampler -> reset_random_state, seed 0), under which the
    # reference trains on IDENTICAL walk/neighbor draws every epoch
    fixed_key = os.environ.get("CAL_FIXED_EPOCH_KEY") == "1"
    for epoch in range(EPOCHS):
        t0 = time.time()
        params, opt_state, state, losses, _ = tr.train_epoch(
            params, opt_state,
            tr.init_state() if tr.has_state else state,
            epoch,
            jax.random.PRNGKey(1 + seed * 1000 + (0 if fixed_key else epoch)),
        )
        _, val_metrics, _ = tr.evaluate(params, d.val, val_neg, 0, state=state)
        m = tr.mean_metrics(val_metrics)
        ap_by_epoch.append(m["average_precision"])
        print(
            f"  ours s{seed} epoch {epoch+1}: loss {np.mean(losses):.4f} "
            f"val ap {m['average_precision']:.4f} auc {m['roc_auc']:.4f} "
            f"({time.time()-t0:.1f}s)",
            flush=True,
        )
    if return_model:
        return ap_by_epoch, dict(trainer=tr, params=params, state=state)
    return ap_by_epoch


def main():
    names = sys.argv[1:] or list(CFG)
    d = get_data()
    rows = []
    for name in names:
        print(f"== {name}", flush=True)
        ref_best, ours_best = [], []
        for seed in range(NUM_SEEDS):
            ref_best.append(max(run_reference(name, d, seed)))
            ours_best.append(max(run_ours(name, d, seed)))
        rows.append((name, ref_best, ours_best))
        print(
            f"  BAND  ref {np.mean(ref_best):.4f}+-{np.std(ref_best):.4f} "
            f"| ours {np.mean(ours_best):.4f}+-{np.std(ours_best):.4f}",
            flush=True,
        )
    print("\nmodel        ref_best_val_ap (mean+-std)   ours_best_val_ap")
    out = {}
    for name, r, o in rows:
        print(
            f"{name:<12} {np.mean(r):>10.4f}+-{np.std(r):.4f} "
            f"{np.mean(o):>14.4f}+-{np.std(o):.4f}"
        )
        out[name] = {
            "ref_best_ap": [float(x) for x in r],
            "ours_best_ap": [float(x) for x in o],
            "epochs": EPOCHS,
        }
    path = os.environ.get("CAL_JSON")
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
