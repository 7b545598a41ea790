"""Calibration bands ON THE TEST-SUITE FIXTURE, at the end-to-end tests'
exact operating points (model config, epochs, lr, batch size).

The suite's end-to-end thresholds (tests/test_remaining_models.py,
test_memory_models.py, test_tgat_end_to_end.py, test_graphmixer.py) were
hand-guessed in round 1; VERDICT r2 weak #4 records that the DyGFormer
one both under-detects regressions (0.62 floor vs ~0.7+ typical) AND
flakes. This script measures, per test protocol:

  * ours: the test's own path (LinkPredictionTrainer.fit) over OUR_SEEDS
    seeds -> per-seed TEST AP at the best-val epoch — the exact quantity
    the tests assert on;
  * ref: the torch reference (imported read-only from /root/reference)
    under a matched protocol (same epochs/lr/config, val-selected test
    AP, deterministic replay negative streams) over REF_SEEDS seeds.

Output: tests/calibration_fixture.json — {test: {ours: [...], ref: [...]}}.
The tests' floors are then ours_mean - max(3*ours_spread, 0.03), with the
ref band recorded alongside for the parity story.

Usage: python scripts/fixture_calibration.py [test_key ...]
Env: OUR_SEEDS (default 5), REF_SEEDS (default 3), OUT_JSON.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from reference_calibration import ReplayNegs  # framework-neutral negatives

OUR_SEEDS = int(os.environ.get("OUR_SEEDS", "5"))
REF_SEEDS = int(os.environ.get("REF_SEEDS", "3"))
B = 200
ROOT = "/tmp/fixturecal2k"

# (model, model_cfg, epochs, lr) — EXACTLY the end-to-end tests' settings
TESTS = {
    "dygformer": ("DyGFormer",
                  dict(max_input_sequence_length=32, patch_size=2,
                       num_layers=2), 4, 5e-4),
    "cawn": ("CAWN", dict(num_neighbors=8, walk_length=1, num_walk_heads=8),
             2, 1e-3),
    "tcl": ("TCL", dict(num_neighbors=10, num_layers=2), 4, 1e-3),
    "tgat": ("TGAT", dict(num_neighbors=10, num_layers=2), 4, 1e-3),
    "graphmixer": ("GraphMixer",
                   dict(num_neighbors=10, num_layers=2, time_gap=200), 3, 1e-3),
    "tgn": ("TGN", dict(num_neighbors=5, num_layers=1), 2, 1e-3),
    "jodie": ("JODIE", dict(num_neighbors=5, num_layers=1), 2, 1e-3),
    "dyrep": ("DyRep", dict(num_neighbors=5, num_layers=1), 2, 1e-3),
}


def get_data():
    from dyglib_tpu.data import get_link_prediction_data, write_synthetic_dataset

    if not os.path.exists(os.path.join(ROOT, "synthetic")):
        # IDENTICAL parameters to tests/conftest.py::synthetic_dataset
        write_synthetic_dataset(
            ROOT, "synthetic", num_src=120, num_dst=60, num_edges=2000,
            node_feat_scale=1.0, seed=7,
        )
    return get_link_prediction_data("synthetic", data_root=ROOT)


def run_ours(model, cfg, epochs, lr, d, seed):
    from dyglib_tpu.models import (
        CAWN, DyGFormer, GraphMixer, MemoryModel, TCL, TGAT,
        compute_src_dst_node_time_shifts,
    )
    from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig

    if model in ("TGN", "JODIE", "DyRep"):
        shifts = compute_src_dst_node_time_shifts(
            d.train.src, d.train.dst, d.train.ts
        )
        bk = MemoryModel(model_name=model, time_shifts=shifts, **cfg)
    else:
        bk = {"CAWN": CAWN, "DyGFormer": DyGFormer, "GraphMixer": GraphMixer,
              "TCL": TCL, "TGAT": TGAT}[model](**cfg)
    tc = TrainConfig(batch_size=B, num_epochs=epochs, patience=5,
                     learning_rate=lr)
    tr = LinkPredictionTrainer(bk, d, tc, os.path.join(ROOT, "ck.pkl"))
    results = tr.fit(seed=seed, log=lambda *a: None)
    return float(results["test metrics"]["average_precision"])


def run_reference(model, cfg, epochs, lr, d, seed):
    """Matched-protocol torch run: per-epoch val AP, test AP at best val."""
    import reference_calibration as rc

    import torch
    import torch.nn as nn
    from models.CAWN import CAWN
    from models.DyGFormer import DyGFormer
    from models.GraphMixer import GraphMixer
    from models.MemoryModel import MemoryModel, compute_src_dst_node_time_shifts
    from models.modules import MergeLayer
    from models.TCL import TCL
    from models.TGAT import TGAT
    from utils.DataLoader import Data
    from utils.utils import get_neighbor_sampler

    from dyglib_tpu.train.metrics import average_precision

    to_ref = lambda s: Data(s.src, s.dst, s.ts, s.eid, s.label)
    train_data, full_data = to_ref(d.train), to_ref(d.full)
    strategy = "time_interval_aware" if model == "CAWN" else "recent"
    # 1e-6 = our TrainConfig default AND the reference best-config value
    # (see reference_calibration.py note on the round-2 tsf mismatch)
    train_sampler = get_neighbor_sampler(train_data, strategy, 1e-6, seed=0)
    full_sampler = get_neighbor_sampler(full_data, strategy, 1e-6, seed=1)
    train_neg = ReplayNegs(train_data.src_node_ids, train_data.dst_node_ids,
                           seed=1000 + seed)
    val_neg = ReplayNegs(full_data.src_node_ids, full_data.dst_node_ids, seed=0)
    test_neg = ReplayNegs(full_data.src_node_ids, full_data.dst_node_ids, seed=2)

    torch.manual_seed(seed)
    np.random.seed(seed)
    nf = d.node_raw_features.astype(np.float32)
    ef = d.edge_raw_features.astype(np.float32)
    common = dict(node_raw_features=nf, edge_raw_features=ef,
                  neighbor_sampler=train_sampler, time_feat_dim=100,
                  dropout=0.1)
    is_memory = model in ("TGN", "JODIE", "DyRep")
    if is_memory:
        sm, ss, dm, ds_ = compute_src_dst_node_time_shifts(
            train_data.src_node_ids, train_data.dst_node_ids,
            train_data.node_interact_times,
        )
        backbone = MemoryModel(
            **common, model_name=model, num_layers=cfg["num_layers"],
            num_heads=2, src_node_mean_time_shift=sm,
            src_node_std_time_shift=ss, dst_node_mean_time_shift_dst=dm,
            dst_node_std_time_shift=ds_,
        )
    elif model == "TGAT":
        backbone = TGAT(**common, num_layers=cfg["num_layers"], num_heads=2)
    elif model == "TCL":
        backbone = TCL(**common, num_layers=cfg["num_layers"], num_heads=2,
                       num_depths=cfg["num_neighbors"] + 1)
    elif model == "GraphMixer":
        backbone = GraphMixer(**common, num_tokens=cfg["num_neighbors"],
                              num_layers=cfg["num_layers"])
    elif model == "DyGFormer":
        backbone = DyGFormer(
            **common, channel_embedding_dim=50, patch_size=cfg["patch_size"],
            num_layers=cfg["num_layers"], num_heads=2,
            max_input_sequence_length=cfg["max_input_sequence_length"],
        )
    elif model == "CAWN":
        backbone = CAWN(**common, position_feat_dim=172,
                        walk_length=cfg["walk_length"],
                        num_walk_heads=cfg["num_walk_heads"])
    head = MergeLayer(172, 172, 172, 1)
    model_seq = nn.Sequential(backbone, head)
    opt = torch.optim.Adam(model_seq.parameters(), lr=lr)
    bce = nn.BCELoss()
    K = cfg.get("num_neighbors", 10)
    time_gap = cfg.get("time_gap", 2000)

    def embed(src, dst, ts, eid, positive):
        if is_memory:
            return backbone.compute_src_dst_node_temporal_embeddings(
                src, dst, ts, eid if positive else None,
                edges_are_positive=positive, num_neighbors=K,
            )
        if model == "GraphMixer":
            return backbone.compute_src_dst_node_temporal_embeddings(
                src, dst, ts, num_neighbors=K, time_gap=time_gap,
            )
        if model == "DyGFormer":
            return backbone.compute_src_dst_node_temporal_embeddings(src, dst, ts)
        return backbone.compute_src_dst_node_temporal_embeddings(
            src, dst, ts, num_neighbors=K,
        )

    def eval_split(stream, neg):
        model_seq.eval()
        neg.reset_random_state()
        aps = []
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
        return float(np.mean(aps))

    best_val, test_at_best = -1.0, 0.0
    for epoch in range(epochs):
        model_seq.train()
        if model != "JODIE":
            backbone.set_neighbor_sampler(train_sampler)
        if is_memory:
            backbone.memory_bank.__init_memory_bank__()
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
        if model != "JODIE":
            backbone.set_neighbor_sampler(full_sampler)
        if is_memory:
            backup = backbone.memory_bank.backup_memory_bank()
        val_ap = eval_split(d.val, val_neg)
        test_ap = eval_split(d.test, test_neg)
        if is_memory:
            backbone.memory_bank.reload_memory_bank(backup)
        if val_ap > best_val:
            best_val, test_at_best = val_ap, test_ap
    return test_at_best


def main():
    keys = sys.argv[1:] or list(TESTS)
    d = get_data()
    out = {}
    path = os.environ.get(
        "OUT_JSON",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests", "calibration_fixture.json"),
    )
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    for key in keys:
        model, cfg, epochs, lr = TESTS[key]
        print(f"== {key} ({model} {cfg} epochs={epochs} lr={lr})", flush=True)
        ours, ref = [], []
        for seed in range(OUR_SEEDS):
            t0 = time.time()
            ap = run_ours(model, cfg, epochs, lr, d, seed)
            ours.append(ap)
            print(f"  ours s{seed}: test AP {ap:.4f} ({time.time()-t0:.0f}s)",
                  flush=True)
        for seed in range(REF_SEEDS):
            t0 = time.time()
            ap = run_reference(model, cfg, epochs, lr, d, seed)
            ref.append(ap)
            print(f"  ref  s{seed}: test AP {ap:.4f} ({time.time()-t0:.0f}s)",
                  flush=True)
        out[key] = {
            "ours_test_ap": ours, "ref_test_ap": ref,
            "ours_mean": float(np.mean(ours)), "ours_std": float(np.std(ours)),
            "ref_mean": float(np.mean(ref)), "ref_std": float(np.std(ref)),
            "config": {"model": model, **cfg, "epochs": epochs, "lr": lr},
        }
        print(f"  BAND ours {np.mean(ours):.4f}+-{np.std(ours):.4f} "
              f"ref {np.mean(ref):.4f}+-{np.std(ref):.4f}", flush=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
