"""Node-classification metric calibration vs the torch reference.

VERDICT r4 weak #3 / next #2: node classification — the reference's
second task — had zero ref-vs-ours metric calibration (the tests assert
finiteness/consistency only). This script closes it:

  1. relabel the shared 6k-edge calibration dataset with LEARNABLE
     labels (a fixed 12% of src nodes are 'flagged'; their edges carry
     label 1 w.p. 0.8 vs 0.02 otherwise, drawn once with a fixed seed —
     random labels would put both sides at AUC 0.5 and hide real bugs
     like wrong embedding rows or head-init mistakes);
  2. per training seed: train the link-prediction backbone on BOTH
     sides (reference_calibration protocol, shared negative replay);
  3. hand each side's own checkpoint to its node-cls pipeline: frozen
     backbone, MLPClassifier head, BCE on the SOURCE embedding, global
     ROC-AUC (train_node_classification.py:28-368,
     evaluate_models_utils.py:157-242);
  4. report best-val AUC and at-best-val test AUC bands per side.

Usage: JAX_PLATFORMS=cpu python scripts/nodecls_calibration.py [model ...]
Env: CAL_EPOCHS (backbone epochs, default 8), NC_EPOCHS (head epochs,
default 10), NC_SEEDS (default 3), NC_JSON.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pandas as pd
import torch
import torch.nn as nn

import reference_calibration as rc

NC_EPOCHS = int(os.environ.get("NC_EPOCHS", "10"))
NC_SEEDS = int(os.environ.get("NC_SEEDS", "3"))
MODELS = ["TGN", "TGAT", "GraphMixer"]
NC_ROOT = rc.ROOT + "_nc"
B = rc.B


def make_labeled_dataset():
    """Copy rc's dataset with learnable labels (deterministic, shared)."""
    rc.get_data()  # ensure the base dataset exists
    src_dir = os.path.join(rc.ROOT, "s")
    dst_dir = os.path.join(NC_ROOT, "s")
    os.makedirs(dst_dir, exist_ok=True)
    for f in os.listdir(src_dir):
        shutil.copy(os.path.join(src_dir, f), os.path.join(dst_dir, f))
    csv = os.path.join(dst_dir, "ml_s.csv")
    df = pd.read_csv(csv)
    rs = np.random.RandomState(777)
    src_ids = np.sort(df["u"].unique())
    flagged = set(
        rs.choice(src_ids, size=max(2, len(src_ids) // 8), replace=False)
    )
    p = np.where(df["u"].isin(flagged), 0.8, 0.02)
    df["label"] = (rs.uniform(size=len(df)) < p).astype(np.float64)
    df.to_csv(csv, index=False)
    return dst_dir


def ref_node_cls(name, ref_ctx, nc_data, seed):
    """Torch-side frozen-backbone node classification
    (train_node_classification.py:150-279 protocol)."""
    from models.modules import MLPClassifier

    from dyglib_tpu.train.metrics import roc_auc

    backbone = ref_ctx["backbone"]
    embed = ref_ctx["embed"]
    is_memory = ref_ctx["is_memory"]
    torch.manual_seed(seed)
    np.random.seed(seed)
    head = MLPClassifier(input_dim=172, dropout=0.1)
    opt = torch.optim.Adam(head.parameters(), lr=rc.LR)
    bce = nn.BCELoss()
    backbone.eval()

    def sweep(stream, train_head):
        preds, trues = [], []
        for s in range(0, len(stream.src), B):
            e = min(s + B, len(stream.src))
            src, dst, ts = stream.src[s:e], stream.dst[s:e], stream.ts[s:e]
            eid, lab = stream.eid[s:e], stream.label[s:e]
            with torch.no_grad():
                se, _ = embed(src, dst, ts, eid, True)
            pp = head(x=se).squeeze(-1).sigmoid()
            if train_head:
                loss = bce(pp, torch.from_numpy(lab).float())
                opt.zero_grad()
                loss.backward()
                opt.step()
            preds.append(pp.detach().numpy())
            trues.append(lab)
        return np.concatenate(trues), np.concatenate(preds)

    best_val, best_epoch, test_at_best = -1.0, -1, float("nan")
    for epoch in range(NC_EPOCHS):
        head.train()
        if is_memory:
            backbone.memory_bank.__init_memory_bank__()
        sweep(nc_data.train, train_head=True)
        head.eval()
        yt, yp = sweep(nc_data.val, train_head=False)
        val_auc = roc_auc(yt, yp)  # GLOBAL AUC (the reference asymmetry)
        yt, yp = sweep(nc_data.test, train_head=False)
        test_auc = roc_auc(yt, yp)
        if val_auc > best_val:
            best_val, best_epoch, test_at_best = val_auc, epoch, test_auc
        print(f"  ref  nc s{seed} epoch {epoch+1}: val auc {val_auc:.4f} "
              f"test auc {test_auc:.4f}", flush=True)
    return best_val, test_at_best


def ours_node_cls(name, ours_ctx, nc_data, seed):
    from dyglib_tpu.train import TrainConfig
    from dyglib_tpu.train.node_classification import NodeClassificationTrainer

    tr = ours_ctx["trainer"]
    nct = NodeClassificationTrainer(
        tr.backbone, nc_data,
        TrainConfig(batch_size=B, num_epochs=NC_EPOCHS,
                    learning_rate=rc.LR, patience=NC_EPOCHS + 1),
        os.path.join(NC_ROOT, f"nc_{name}_{seed}.pkl"),
        ours_ctx["params"]["backbone"],
    )
    res = nct.fit(seed=seed, log=lambda *a: None)
    return (
        res["validate metrics"]["roc_auc"],
        res["test metrics"]["roc_auc"],
    )


def main():
    models = sys.argv[1:] or MODELS
    make_labeled_dataset()
    from dyglib_tpu.data import get_node_classification_data

    d = rc.get_data()
    nc = get_node_classification_data("s", data_root=NC_ROOT)
    # torch side consumes plain streams; reuse our container fields
    out = {}
    for name in models:
        rows = {"ref_val": [], "ref_test": [], "ours_val": [], "ours_test": []}
        for seed in range(NC_SEEDS):
            print(f"== {name} nc seed {seed}: training backbones", flush=True)
            t0 = time.time()
            _, ref_ctx = rc.run_reference(name, d, seed, return_model=True)
            _, ours_ctx = rc.run_ours(name, d, seed, return_model=True)
            rv, rt = ref_node_cls(name, ref_ctx, nc, seed)
            ov, ot = ours_node_cls(name, ours_ctx, nc, seed)
            rows["ref_val"].append(rv)
            rows["ref_test"].append(rt)
            rows["ours_val"].append(ov)
            rows["ours_test"].append(ot)
            print(
                f"  {name} s{seed}: ref val/test {rv:.4f}/{rt:.4f} | "
                f"ours val/test {ov:.4f}/{ot:.4f} "
                f"({time.time()-t0:.0f}s)", flush=True,
            )
        out[name] = rows
        _dump(out)
    print("\n== node-classification AUC bands (global AUC, best-val epoch)")
    for name, r in out.items():
        for arm in ("val", "test"):
            rr = np.asarray(r[f"ref_{arm}"])
            oo = np.asarray(r[f"ours_{arm}"])
            print(f"{name:<11} {arm:>4}: ref {rr.mean():.4f}+-{rr.std():.4f}"
                  f" | ours {oo.mean():.4f}+-{oo.std():.4f}")


def _dump(out):
    path = os.environ.get("NC_JSON")
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
