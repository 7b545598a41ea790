"""End-metric calibration: REFERENCE (torch CPU, imported from
/root/reference — oracle only, never vendored) vs dyglib_tpu, every
trainable model family, same synthetic dataset and protocol.

For each model: 3 training epochs at lr=1e-3, B=200, small
reference-shaped configs; report per-epoch val AP/AUC for both sides and
the best-epoch values. Negative-sampler RNG streams differ across
frameworks (SURVEY §7 RNG-parity plan), so the comparison is a BAND, not
an equality — the recorded bands go to BASELINE.md and set the thresholds
of the end-to-end tests.

Usage: python scripts/reference_calibration.py [model ...]
  (default: all of JODIE DyRep TGN TGAT TCL GraphMixer DyGFormer CAWN)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")

import numpy as np
import torch
import torch.nn as nn

ROOT = "/tmp/refcal"
EPOCHS = int(os.environ.get("CAL_EPOCHS", "3"))
B, LR = 200, 1e-3
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
            ROOT, "s", num_src=120, num_dst=60, num_edges=2000,
            node_feat_scale=1.0, seed=7,
        )
    return get_link_prediction_data("s", data_root=ROOT)


def run_reference(name, d):
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
    train_sampler = get_neighbor_sampler(train_data, strategy, seed=0)
    full_sampler = get_neighbor_sampler(full_data, strategy, seed=1)
    train_neg = NegativeEdgeSampler(train_data.src_node_ids, train_data.dst_node_ids)
    val_neg = NegativeEdgeSampler(full_data.src_node_ids, full_data.dst_node_ids, seed=0)

    torch.manual_seed(0)
    np.random.seed(0)
    nf = d.node_raw_features.astype(np.float32)
    ef = d.edge_raw_features.astype(np.float32)
    common = dict(node_raw_features=nf, edge_raw_features=ef,
                  neighbor_sampler=train_sampler, time_feat_dim=100, dropout=0.1)
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
                nsrc, ndst = neg.sample(e - s)
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

    best_ap = 0.0
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
        ap, auc = eval_split(d.val, val_neg)
        best_ap = max(best_ap, ap)
        print(
            f"  ref   epoch {epoch+1}: loss {np.mean(losses):.4f} "
            f"val ap {ap:.4f} auc {auc:.4f} ({time.time()-t0:.1f}s)",
            flush=True,
        )
    return best_ap


def run_ours(name, d):
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
                         num_layers=cfg["num_layers"], time_shifts=shifts)
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
    params, opt_state = tr.init_params(0)
    state = tr.init_state()
    best_ap = 0.0
    for epoch in range(EPOCHS):
        t0 = time.time()
        params, opt_state, state, losses, _ = tr.train_epoch(
            params, opt_state,
            tr.init_state() if tr.has_state else state,
            epoch, jax.random.PRNGKey(epoch),
        )
        _, val_metrics, _ = tr.evaluate(params, d.val, tr.val_neg, 0, state=state)
        m = tr.mean_metrics(val_metrics)
        best_ap = max(best_ap, m["average_precision"])
        print(
            f"  ours  epoch {epoch+1}: loss {np.mean(losses):.4f} "
            f"val ap {m['average_precision']:.4f} auc {m['roc_auc']:.4f} "
            f"({time.time()-t0:.1f}s)",
            flush=True,
        )
    return best_ap


def main():
    names = sys.argv[1:] or list(CFG)
    d = get_data()
    rows = []
    for name in names:
        print(f"== {name}", flush=True)
        ref_ap = run_reference(name, d)
        ours_ap = run_ours(name, d)
        rows.append((name, ref_ap, ours_ap))
        print(f"  BEST  ref {ref_ap:.4f} | ours {ours_ap:.4f}", flush=True)
    print("\nmodel        ref_best_val_ap   ours_best_val_ap")
    for name, r, o in rows:
        print(f"{name:<12} {r:>15.4f} {o:>18.4f}")


if __name__ == "__main__":
    main()
