"""Experiment runners: the reference's four CLI drivers as library functions.

Behavioral parity targets:
  * train_link_prediction.py:28-501 — multi-run training with per-run
    logging, checkpoints at ./saved_models/{model}/{dataset}/{model}_seed{run}
    and results JSON at ./saved_results/{model}/{dataset}/, plus mean +/-
    sample-std aggregation over runs;
  * evaluate_link_prediction.py:24-300 — checkpoint loading and the
    random/historical/inductive negative-sampler layout with
    ``last_observed_time`` boundaries (train end for val, val end for test);
  * train_node_classification.py / evaluate_node_classification.py — the
    frozen-backbone head task with link-pred checkpoint handoff.
"""
from __future__ import annotations

import json
import logging
import os
import time

import numpy as np

from .configs.factory import build_backbone
from .data.datasets import get_link_prediction_data, get_node_classification_data
from .graph.neg_sampler import NegativeEdgeSampler
from .train.checkpoints import load_checkpoint
from .train.edgebank_eval import evaluate_edge_bank_link_prediction
from .train.link_prediction import LinkPredictionTrainer, TrainConfig
from .train.node_classification import NodeClassificationTrainer


def make_run_logger(args, run_name: str) -> logging.Logger:
    """Per-run file (DEBUG) + console (WARNING) logger
    (train_link_prediction.py:72-89)."""
    logger = logging.getLogger(run_name)
    logger.setLevel(logging.DEBUG)
    logger.handlers.clear()
    log_dir = f"./logs/{args.model_name}/{args.dataset_name}/{run_name}/"
    os.makedirs(log_dir, exist_ok=True)
    fh = logging.FileHandler(os.path.join(log_dir, f"{time.time()}.log"))
    fh.setLevel(logging.DEBUG)
    ch = logging.StreamHandler()
    ch.setLevel(logging.WARNING)
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    fh.setFormatter(fmt)
    ch.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(ch)
    return logger


def train_config_from_args(args) -> TrainConfig:
    return TrainConfig(
        batch_size=args.batch_size,
        num_epochs=args.num_epochs,
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        optimizer=args.optimizer.lower(),
        patience=args.patience,
        test_interval_epochs=args.test_interval_epochs,
        val_ratio=args.val_ratio,
        test_ratio=args.test_ratio,
        time_scaling_factor=args.time_scaling_factor,
        head_dropout=args.dropout,
        scan_epochs=getattr(args, "scan_epochs", False),
        sequence_buckets=not getattr(args, "no_sequence_buckets", False),
        check_memory_order=getattr(args, "check_memory_order", False),
        show_progress=getattr(args, "show_progress", False),
    )


def setup_parallelism(args):
    """Multi-host bootstrap + mesh construction from CLI flags.

    Returns (mesh | None, is_lead_process). Call once per process before
    building trainers. Single process, --data_parallelism 0 (the default)
    keeps the reference-like single-device path.
    """
    from .parallel.distributed import initialize_distributed

    if getattr(args, "fast_prng", False):
        from .utils import use_fast_prng

        use_fast_prng()
    num_procs = getattr(args, "num_processes", 1)
    proc_idx, _ = initialize_distributed(
        coordinator_address=getattr(args, "coordinator_address", "") or None,
        num_processes=num_procs if num_procs > 1 else None,
        process_id=getattr(args, "process_id", 0) if num_procs > 1 else None,
    )
    dp = getattr(args, "data_parallelism", 0)
    mp = getattr(args, "model_parallelism", 1)
    if dp == 0 and mp == 1:
        return None, proc_idx == 0
    import jax

    from .parallel.mesh import make_mesh

    n = len(jax.devices()) if dp in (0, -1) else dp * mp
    return make_mesh(n, model_parallelism=mp), proc_idx == 0


def _save_results(args, run_name: str, results: dict) -> str:
    folder = f"./saved_results/{args.model_name}/{args.dataset_name}"
    os.makedirs(folder, exist_ok=True)
    path = os.path.join(folder, f"{run_name}.json")
    payload = {
        split: {k: f"{v:.4f}" for k, v in metrics.items()}
        for split, metrics in results.items()
        if isinstance(metrics, dict) and split.endswith("metrics")
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=4)
    return path


def _aggregate(logger, name: str, all_runs: list[dict]) -> dict:
    out = {}
    if not all_runs:
        return out
    for metric in all_runs[0]:
        vals = [r[metric] for r in all_runs]
        mean, std = float(np.mean(vals)), float(np.std(vals, ddof=1)) if len(vals) > 1 else 0.0
        logger.info(f"average {name} {metric}, {mean:.4f} ± {std:.4f}")
        out[metric] = (mean, std)
    return out


def checkpoint_path(args, run: int) -> str:
    folder = f"./saved_models/{args.model_name}/{args.dataset_name}/{args.model_name}_seed{run}/"
    os.makedirs(folder, exist_ok=True)
    return os.path.join(folder, f"{args.model_name}_seed{run}.pkl")


def run_link_prediction_training(args) -> dict:
    """Multi-run training driver; returns aggregate metrics."""
    mesh, is_lead = setup_parallelism(args)
    data = get_link_prediction_data(
        args.dataset_name, args.val_ratio, args.test_ratio, args.data_root
    )
    cfg = train_config_from_args(args)
    aggregates = {k: [] for k in ("validate", "new node validate", "test", "new node test")}

    logger = None
    for run in range(args.num_runs):
        run_name = f"{args.model_name}_seed{run}"
        logger = make_run_logger(args, run_name)
        logger.info(f"********** Run {run + 1} starts. **********")
        logger.info(f"configuration is {args}")
        t0 = time.time()

        backbone = build_backbone(args, data)
        trainer = LinkPredictionTrainer(
            backbone, data, cfg, checkpoint_path(args, run), mesh=mesh
        )
        results = trainer.fit(seed=run, log=logger.info)
        for split in aggregates:
            aggregates[split].append(results[f"{split} metrics"])
            for k, v in results[f"{split} metrics"].items():
                logger.info(f"{split} {k}, {v:.4f}")
        logger.info(f"Run {run + 1} cost {time.time() - t0:.2f} seconds.")
        if is_lead:  # results/checkpoints written once under multi-host
            _save_results(args, run_name, results)

    logger.info(f"metrics over {args.num_runs} runs:")
    return {
        split: _aggregate(logger, split, runs)
        for split, runs in aggregates.items()
    }


def _build_eval_neg_samplers(args, data):
    """Reference sampler layout (evaluate_link_prediction.py:41-58)."""
    s = args.negative_sample_strategy
    if s != "random":
        mk = lambda stream, last, seed: NegativeEdgeSampler(
            stream.src, stream.dst, interact_times=stream.ts,
            last_observed_time=last, negative_sample_strategy=s, seed=seed,
        )
        train_end = float(data.train.ts[-1])
        val_end = float(data.val.ts[-1])
        return (
            mk(data.full, train_end, 0),
            mk(data.new_node_val, train_end, 1),
            mk(data.full, val_end, 2),
            mk(data.new_node_test, val_end, 3),
        )
    return (
        NegativeEdgeSampler(data.full.src, data.full.dst, seed=0),
        NegativeEdgeSampler(data.new_node_val.src, data.new_node_val.dst, seed=1),
        NegativeEdgeSampler(data.full.src, data.full.dst, seed=2),
        NegativeEdgeSampler(data.new_node_test.src, data.new_node_test.dst, seed=3),
    )


def run_link_prediction_evaluation(args) -> dict:
    """Evaluate saved checkpoints under a negative-sampling strategy
    (evaluate_link_prediction.py), including the EdgeBank arm."""
    data = get_link_prediction_data(
        args.dataset_name, args.val_ratio, args.test_ratio, args.data_root
    )
    cfg = train_config_from_args(args)
    val_neg, nn_val_neg, test_neg, nn_test_neg = _build_eval_neg_samplers(args, data)

    if args.model_name == "EdgeBank":
        all_runs = []
        logger = None
        for run in range(args.num_runs):
            run_name = (
                f"{args.negative_sample_strategy}_negative_sampling_EdgeBank_seed{run}"
            )
            logger = make_run_logger(args, run_name)
            _, test_metrics = evaluate_edge_bank_link_prediction(
                data, test_neg, args.batch_size,
                args.edge_bank_memory_mode, args.time_window_mode,
                args.test_ratio,
            )
            md = {
                k: float(np.mean([m[k] for m in test_metrics]))
                for k in test_metrics[0]
            }
            for k, v in md.items():
                logger.info(f"test {k}, {v:.4f}")
            all_runs.append(md)
            _save_results(args, run_name, {"test metrics": md})
        return {"test": _aggregate(logger, "test", all_runs)}

    mesh, is_lead = setup_parallelism(args)
    aggregates = {k: [] for k in ("validate", "new node validate", "test", "new node test")}
    logger = None
    for run in range(args.num_runs):
        run_name = (
            f"{args.negative_sample_strategy}_negative_sampling_"
            f"{args.model_name}_seed{run}"
        )
        logger = make_run_logger(args, run_name)
        backbone = build_backbone(args, data)
        trainer = LinkPredictionTrainer(
            backbone, data, cfg, checkpoint_path(args, run), mesh=mesh
        )
        ckpt = load_checkpoint(checkpoint_path(args, run))
        import jax

        params = trainer._place_repl(jax.device_put(ckpt["params"]))
        state = (
            trainer._place_state(jax.device_put(ckpt["state"]))
            if ckpt["state"] is not None else None
        )

        _, val_metrics, val_state = trainer.evaluate(
            params, data.val, val_neg, 0, state=state
        )
        _, nn_val_metrics, _ = trainer.evaluate(
            params, data.new_node_val, nn_val_neg, 1, state=state
        )
        _, test_metrics, _ = trainer.evaluate(
            params, data.test, test_neg, 2, state=val_state
        )
        _, nn_test_metrics, _ = trainer.evaluate(
            params, data.new_node_test, nn_test_neg, 3, state=val_state
        )
        per_split = {
            "validate": trainer.mean_metrics(val_metrics),
            "new node validate": trainer.mean_metrics(nn_val_metrics),
            "test": trainer.mean_metrics(test_metrics),
            "new node test": trainer.mean_metrics(nn_test_metrics),
        }
        for split, md in per_split.items():
            aggregates[split].append(md)
            for k, v in md.items():
                logger.info(f"{split} {k}, {v:.4f}")
        if is_lead:
            _save_results(
                args, run_name, {f"{s} metrics": m for s, m in per_split.items()}
            )
    return {
        split: _aggregate(logger, split, runs)
        for split, runs in aggregates.items()
    }


def run_node_classification_evaluation(args) -> dict:
    """Evaluate saved node-classification heads (evaluate_node_classification.py)."""
    link_data = get_link_prediction_data(
        args.dataset_name, args.val_ratio, args.test_ratio, args.data_root
    )
    nc_data = get_node_classification_data(
        args.dataset_name, args.val_ratio, args.test_ratio, args.data_root
    )
    cfg = train_config_from_args(args)
    all_test = []
    logger = None
    for run in range(args.num_runs):
        run_name = f"evaluate_node_classification_{args.model_name}_seed{run}"
        logger = make_run_logger(args, run_name)
        backbone = build_backbone(args, link_data)
        bk_ckpt = load_checkpoint(checkpoint_path(args, run))
        head_ckpt = load_checkpoint(
            checkpoint_path(args, run).replace(".pkl", "_node_classification.pkl")
        )
        import jax

        trainer = NodeClassificationTrainer(
            backbone, nc_data, cfg, "/dev/null",
            jax.device_put(bk_ckpt["params"]["backbone"]),
        )
        head_params = jax.device_put(head_ckpt["params"])
        state = (
            jax.device_put(head_ckpt["state"])
            if head_ckpt["state"] is not None else None
        )
        # memory models: the head checkpoint normally carries the post-val
        # memory state; if it is absent, rebuild it by replaying train+val
        # chronologically (every edge commits during eval sweeps) so test
        # never runs on cold memory
        if trainer.has_state and state is None:
            logger.warning(
                "checkpoint has no memory state — replaying train+val "
                "chronologically to warm memory before test"
            )
            state = trainer.init_state()
            _, state = trainer.evaluate(
                head_params, nc_data.train, state=state, salt=2
            )
            _, state = trainer.evaluate(
                head_params, nc_data.val, state=state, salt=3
            )
        test_metrics, _ = trainer.evaluate(
            head_params, nc_data.test, state=state, salt=1
        )
        for k, v in test_metrics.items():
            logger.info(f"test {k}, {v:.4f}")
        all_test.append(test_metrics)
        _save_results(args, run_name, {"test metrics": test_metrics})
    return {"test": _aggregate(logger, "test", all_test)}


def run_node_classification_training(args) -> dict:
    """Frozen-backbone head training (train_node_classification.py)."""
    link_data = get_link_prediction_data(
        args.dataset_name, args.val_ratio, args.test_ratio, args.data_root
    )
    nc_data = get_node_classification_data(
        args.dataset_name, args.val_ratio, args.test_ratio, args.data_root
    )
    cfg = train_config_from_args(args)
    all_val, all_test = [], []
    logger = None
    for run in range(args.num_runs):
        run_name = f"node_classification_{args.model_name}_seed{run}"
        logger = make_run_logger(args, run_name)
        backbone = build_backbone(args, link_data)
        ckpt = load_checkpoint(checkpoint_path(args, run))
        import jax

        backbone_params = jax.device_put(ckpt["params"]["backbone"])
        trainer = NodeClassificationTrainer(
            backbone, nc_data, cfg,
            checkpoint_path(args, run).replace(".pkl", "_node_classification.pkl"),
            backbone_params,
        )
        results = trainer.fit(seed=run, log=logger.info)
        all_val.append(results["validate metrics"])
        all_test.append(results["test metrics"])
        _save_results(args, run_name, results)
    return {
        "validate": _aggregate(logger, "validate", all_val),
        "test": _aggregate(logger, "test", all_test),
    }
