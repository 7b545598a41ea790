"""Eval-arm PROTOCOL parity: same weights, same memory advance, same
negatives — do the two frameworks' historical/inductive eval loops
produce the same number?

VERDICT r4 weak #1: TGN's historical val arm recorded ref 0.6634 vs ours
0.6982 under SHARED negatives.  That gap has exactly two possible homes:
(a) the eval/memory mechanics differ (a protocol bug on our side), or
(b) the trained models differ (trajectory-level seed variance that the
historical arm amplifies).  This script isolates (a) with training
removed from the equation entirely:

  1. build our TGN and the torch reference TGN at the SAME config;
  2. transplant OUR initial weights into the torch model (the
     tests/test_memory_model_full_parity.py transplant — torch-layout
     fused cells make it a direct transpose), head included;
  3. advance BOTH sides' memory through the train split in eval mode
     (deterministic: 'recent' sampling, no dropout, positives committed
     batch by batch — the protocol's end-of-train memory staging);
  4. compare the two memory banks elementwise;
  5. run the val historical AND inductive arms with both sides scoring
     the reference sampler's identical negative stream; compare AP.

Pass = memory allclose + |delta AP| at float-noise level (< ~2e-3): the
eval loops are then PROVEN equivalent and the round-4 deviation is
trajectory-level (home (b)), to be bounded by the widened
eval_arm_calibration bands.  Fail = a real mechanics bug with a tensor
to diff.

Usage: JAX_PLATFORMS=cpu python scripts/evalarm_protocol_parity.py [model]
  (model in TGN/DyRep/JODIE; default TGN)
"""
import importlib.util
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import torch

import reference_calibration as rc
from eval_arm_calibration import _make_ref_sampler, ref_eval_arm

spec = importlib.util.spec_from_file_location(
    "mm_parity", "/root/repo/tests/test_memory_model_full_parity.py"
)
mm = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mm)


def build_ref(name, d):
    """Torch reference TGN/DyRep/JODIE at the rc.CFG config (mirrors
    reference_calibration.run_reference without the training loop)."""
    import torch.nn as nn
    from models.MemoryModel import (
        MemoryModel, compute_src_dst_node_time_shifts,
    )
    from models.modules import MergeLayer
    from utils.DataLoader import Data
    from utils.utils import get_neighbor_sampler

    cfg = rc.CFG[name]
    to_ref = lambda s: Data(s.src, s.dst, s.ts, s.eid, s.label)
    full_sampler = get_neighbor_sampler(to_ref(d.full), "recent", 1e-6, seed=1)
    sm, ss, dm, ds_ = compute_src_dst_node_time_shifts(
        d.train.src, d.train.dst, d.train.ts
    )
    backbone = MemoryModel(
        node_raw_features=d.node_raw_features.astype(np.float32),
        edge_raw_features=d.edge_raw_features.astype(np.float32),
        neighbor_sampler=full_sampler, time_feat_dim=100, dropout=0.1,
        model_name=name, num_layers=cfg["num_layers"], num_heads=2,
        src_node_mean_time_shift=sm, src_node_std_time_shift=ss,
        dst_node_mean_time_shift_dst=dm, dst_node_std_time_shift=ds_,
    )
    head = MergeLayer(172, 172, 172, 1)
    model = nn.Sequential(backbone, head)
    K = cfg["num_neighbors"]

    def embed(src, dst, ts, eid, positive):
        return backbone.compute_src_dst_node_temporal_embeddings(
            src, dst, ts, eid if positive else None,
            edges_are_positive=positive, num_neighbors=K,
        )

    return dict(backbone=backbone, head=head, model=model, embed=embed,
                is_memory=True)


def build_ours(name, d):
    from dyglib_tpu.models import (
        MemoryModel, compute_src_dst_node_time_shifts,
    )
    from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig

    cfg = rc.CFG[name]
    shifts = compute_src_dst_node_time_shifts(
        d.train.src, d.train.dst, d.train.ts
    )
    bk = MemoryModel(model_name=name, num_neighbors=cfg["num_neighbors"],
                     num_layers=cfg["num_layers"], time_shifts=shifts)
    tr = LinkPredictionTrainer(
        bk, d, TrainConfig(batch_size=rc.B), os.path.join(rc.ROOT, "pp.pkl")
    )
    params, _ = tr.init_params(0)
    return tr, params


def main():
    name = (sys.argv[1:] or ["TGN"])[0]
    d = rc.get_data()
    ref_ctx = build_ref(name, d)
    tr, params = build_ours(name, d)
    if os.environ.get("PP_EPOCHS", "0") != "0":
        # trained operating point: train OUR side (rc protocol), then
        # transplant the TRAINED weights — the loop-parity question is
        # the same, but scores are now informative rather than ~chance
        print(f"training ours for {os.environ['PP_EPOCHS']} epochs "
              f"(PP_EPOCHS)", flush=True)
        rc.EPOCHS = int(os.environ["PP_EPOCHS"])
        _, ours_ctx = rc.run_ours(name, d, seed=0, return_model=True)
        tr, params = ours_ctx["trainer"], ours_ctx["params"]

    # transplant OUR weights into the torch reference (backbone + head)
    mm._transplant(ref_ctx["backbone"], params["backbone"]["params"], name)
    hp = params["head"]["params"]
    mm._set_linear(ref_ctx["head"].fc1, hp["fc1"]["kernel"], hp["fc1"]["bias"])
    mm._set_linear(ref_ctx["head"].fc2, hp["fc2"]["kernel"], hp["fc2"]["bias"])

    # advance both memories through train (eval mode, deterministic)
    ref_ctx["backbone"].memory_bank.__init_memory_bank__()
    adv_neg = rc.ReplayNegs(d.full.src, d.full.dst, seed=5)
    ref_train_ap, _ = ref_eval_arm(ref_ctx, d.train, adv_neg)
    adv_neg2 = rc.ReplayNegs(d.full.src, d.full.dst, seed=5)
    _, m_train, state = tr.evaluate(
        params, d.train, adv_neg2, 0, state=tr.init_state()
    )
    ours_train_ap = tr.mean_metrics(m_train)["average_precision"]
    print(f"train-sweep AP (same replay negs): ref {ref_train_ap:.6f} "
          f"ours {ours_train_ap:.6f}  delta {ours_train_ap-ref_train_ap:+.6f}")

    ref_mem = ref_ctx["backbone"].memory_bank.node_memories.detach().numpy()
    n = ref_mem.shape[0]  # ours pads the node axis; rows >= n stay zero
    ours_mem = np.asarray(state.memory)[:n]
    dmem = np.abs(ref_mem - ours_mem)
    print(f"end-of-train memory: max|delta| {dmem.max():.3e} "
          f"mean|delta| {dmem.mean():.3e} "
          f"(|mem| scale {np.abs(ref_mem).mean():.3e})")
    ref_lu = ref_ctx["backbone"].memory_bank.node_last_updated_times.numpy()
    dlu = np.abs(ref_lu - np.asarray(state.last_update)[:n]).max()
    print(f"last_update: max|delta| {dlu:.3e}")

    mem_backup = ref_ctx["backbone"].memory_bank.backup_memory_bank()
    for strat in ("historical", "inductive"):
        ref_ctx["backbone"].memory_bank.reload_memory_bank(mem_backup)
        ref_ap, _ = ref_eval_arm(
            ref_ctx, d.val, _make_ref_sampler(d, "val", strat, 0)
        )
        _, m, _ = tr.evaluate(
            params, d.val, _make_ref_sampler(d, "val", strat, 0),
            0, state=state,
        )
        ours_ap = tr.mean_metrics(m)["average_precision"]
        print(f"val/{strat:>10}: ref {ref_ap:.6f} ours {ours_ap:.6f} "
              f"delta {ours_ap-ref_ap:+.6f}")


if __name__ == "__main__":
    main()
