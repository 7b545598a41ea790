"""Historical/inductive eval-arm calibration (VERDICT r3 #5).

The random-strategy bands (reference_calibration.py) leave the
historical/inductive negative samplers — a distinguishing DyGLib
capability (/root/reference/evaluate_link_prediction.py:41-58) —
metrically uncalibrated. This script trains TGN, TGAT and DyGFormer on
both sides (shared replay train negatives, as in reference_calibration)
and evaluates the FINAL model on the val split under `historical` and
`inductive` negative samplers.

Variance control: BOTH sides consume the REFERENCE's own
NegativeEdgeSampler instance (pure numpy, oracle-only import) seeded
identically — our trainer's evaluate() speaks the same sampler interface
(sample(n, batch ids, batch time range) + reset_random_state), so the
two sides score the SAME negative edges batch for batch and the band
isolates model/protocol differences from sampler RNG streams. Our own
NegativeEdgeSampler's distribution parity is covered separately
(tests/test_neg_sampler.py, tests/test_inductive_eval.py); a third
column evaluates ours with OUR sampler to show it lands in the band.

Usage: JAX_PLATFORMS=cpu python scripts/eval_arm_calibration.py [model ...]
Env: CAL_EPOCHS (default 8), EVALARM_SEEDS (default 2), EVALARM_JSON.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import reference_calibration as rc

SEEDS = int(os.environ.get("EVALARM_SEEDS", "2"))
MODELS = ["TGN", "TGAT", "DyGFormer"]
STRATEGIES = ["historical", "inductive"]


def _make_ref_sampler(d, strategy, seed=0):
    """Reference val-arm sampler layout (evaluate_link_prediction.py:41-46):
    src/dst/times from full data, last_observed_time = end of train."""
    from utils.utils import NegativeEdgeSampler

    return NegativeEdgeSampler(
        src_node_ids=d.full.src, dst_node_ids=d.full.dst,
        interact_times=d.full.ts,
        last_observed_time=d.train.ts[-1],
        negative_sample_strategy=strategy, seed=seed,
    )


def _make_ours_sampler(d, strategy, seed=0):
    from dyglib_tpu.graph import NegativeEdgeSampler

    return NegativeEdgeSampler(
        d.full.src, d.full.dst, interact_times=d.full.ts,
        last_observed_time=d.train.ts[-1],
        negative_sample_strategy=strategy, seed=seed,
    )


def ref_eval_arm(ctx, d, neg):
    """Torch-side val sweep under a non-random sampler (the reference's
    evaluate_models_utils.py:55-60 protocol: the sampled (neg_src,
    neg_dst) pair is scored, batch time range plumbed through)."""
    import torch

    from dyglib_tpu.train.metrics import average_precision, roc_auc

    model, embed, head = ctx["model"], ctx["embed"], ctx["head"]
    is_memory = ctx["is_memory"]
    stream = d.val
    model.eval()
    neg.reset_random_state()
    aps, aucs = [], []
    B = rc.B
    with torch.no_grad():
        for s in range(0, len(stream.src), B):
            e = min(s + B, len(stream.src))
            src, dst, ts = stream.src[s:e], stream.dst[s:e], stream.ts[s:e]
            eid = stream.eid[s:e]
            nsrc, ndst = neg.sample(
                e - s, batch_src_node_ids=src, batch_dst_node_ids=dst,
                current_batch_start_time=ts[0], current_batch_end_time=ts[-1],
            )
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


def main():
    models = sys.argv[1:] or MODELS
    d = rc.get_data()
    out = {}
    for name in models:
        out[name] = {}
        for seed in range(SEEDS):
            print(f"== {name} seed {seed}: training both sides", flush=True)
            _, ref_ctx = rc.run_reference(name, d, seed, return_model=True)
            _, ours_ctx = rc.run_ours(name, d, seed, return_model=True)
            tr = ours_ctx["trainer"]
            params, state = ours_ctx["params"], ours_ctx["state"]
            import torch

            is_memory = ref_ctx["is_memory"]
            if is_memory:
                # run_reference's final epoch ends with a val eval that
                # commits val positives, leaving memory past val time; an
                # eval arm over val would trip the memory-in-the-past
                # assert (MemoryModel.py:475). Restore the END-OF-TRAIN
                # memory captured right after the final train epoch.
                ref_ctx["backbone"].memory_bank.reload_memory_bank(
                    ref_ctx["post_train_memory"]
                )
            for strat in STRATEGIES:
                back = None
                if is_memory:
                    back = ref_ctx["backbone"].memory_bank.backup_memory_bank()
                t0 = time.time()
                ref_ap, _ = ref_eval_arm(ref_ctx, d, _make_ref_sampler(d, strat))
                if is_memory:
                    ref_ctx["backbone"].memory_bank.reload_memory_bank(back)
                # ours, scoring the SAME negatives (reference sampler obj)
                _, m_shared, _ = tr.evaluate(
                    params, d.val, _make_ref_sampler(d, strat), 0, state=state
                )
                ours_shared = tr.mean_metrics(m_shared)["average_precision"]
                # ours with OUR sampler implementation (different RNG stream)
                _, m_own, _ = tr.evaluate(
                    params, d.val, _make_ours_sampler(d, strat), 0, state=state
                )
                ours_own = tr.mean_metrics(m_own)["average_precision"]
                rec = out[name].setdefault(
                    strat, {"ref": [], "ours_shared_negs": [], "ours_own_sampler": []}
                )
                rec["ref"].append(ref_ap)
                rec["ours_shared_negs"].append(ours_shared)
                rec["ours_own_sampler"].append(ours_own)
                print(
                    f"  {strat:>10} s{seed}: ref {ref_ap:.4f} | "
                    f"ours(shared negs) {ours_shared:.4f} | "
                    f"ours(own sampler) {ours_own:.4f} "
                    f"({time.time()-t0:.0f}s)", flush=True,
                )
    for name, strats in out.items():
        for strat, rec in strats.items():
            print(
                f"{name:<10} {strat:>10}: ref {np.mean(rec['ref']):.4f}"
                f"+-{np.std(rec['ref']):.4f} | shared "
                f"{np.mean(rec['ours_shared_negs']):.4f}"
                f"+-{np.std(rec['ours_shared_negs']):.4f} | own "
                f"{np.mean(rec['ours_own_sampler']):.4f}"
                f"+-{np.std(rec['ours_own_sampler']):.4f}"
            )
    path = os.environ.get("EVALARM_JSON")
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
