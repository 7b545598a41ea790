"""Node classification task + full CLI-driver pipeline on synthetic data."""
import json
import os

import numpy as np
import pytest

from dyglib_tpu.configs import get_link_prediction_args, get_node_classification_args
from dyglib_tpu.runners import (
    run_link_prediction_evaluation,
    run_link_prediction_training,
    run_node_classification_training,
)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory, synthetic_dataset, monkeypatch_module=None):
    d = tmp_path_factory.mktemp("runs")
    return str(d), synthetic_dataset


def _argv(data_root, extra):
    return [
        "--dataset_name", "synthetic",
        "--data_root", data_root,
        "--num_runs", "1",
        "--num_epochs", "2",
        "--patience", "5",
        "--batch_size", "200",
        "--learning_rate", "1e-3",
    ] + extra


@pytest.mark.slow
def test_full_cli_pipeline(workdir):
    """train -> evaluate (historical negatives) -> node classification,
    through the same surfaces the reference drivers expose."""
    wd, data_root = workdir
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        args = get_link_prediction_args(
            _argv(data_root, ["--model_name", "TGAT", "--num_neighbors", "10"])
        )
        agg = run_link_prediction_training(args)
        ap_mean, _ = agg["test"]["average_precision"]
        assert 0.4 < ap_mean <= 1.0

        # artifacts in the reference layout
        assert os.path.exists(
            "saved_models/TGAT/synthetic/TGAT_seed0/TGAT_seed0.pkl"
        )
        rj = json.load(open("saved_results/TGAT/synthetic/TGAT_seed0.json"))
        assert "test metrics" in rj and "new node test metrics" in rj
        assert os.path.isdir("logs/TGAT/synthetic/TGAT_seed0")

        # evaluation with historical negatives against the saved checkpoint
        eval_args = get_link_prediction_args(
            _argv(
                data_root,
                [
                    "--model_name", "TGAT", "--num_neighbors", "10",
                    "--negative_sample_strategy", "historical",
                ],
            ),
            is_evaluation=True,
        )
        agg = run_link_prediction_evaluation(eval_args)
        # historical negatives are HARDER than random: AP well below the
        # random-negative score but still defined
        ap_hist, _ = agg["test"]["average_precision"]
        assert 0.0 < ap_hist <= 1.0

        # node classification on the frozen backbone
        nc_args = get_node_classification_args(
            _argv(data_root, ["--model_name", "TGAT", "--num_neighbors", "10"])
        )
        agg = run_node_classification_training(nc_args)
        auc_mean, _ = agg["test"]["roc_auc"]
        assert np.isfinite(auc_mean) and 0.0 <= auc_mean <= 1.0
    finally:
        os.chdir(cwd)


def test_edgebank_cli_evaluation(workdir):
    wd, data_root = workdir
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        args = get_link_prediction_args(
            _argv(data_root, ["--model_name", "EdgeBank", "--load_best_configs"]),
            is_evaluation=True,
        )
        # synthetic isn't in the best-config tables' dataset lists: the
        # fallthrough arm applies (repeat_threshold for some strategies)
        agg = run_link_prediction_evaluation(args)
        ap, _ = agg["test"]["average_precision"]
        assert 0.3 < ap <= 1.0
    finally:
        os.chdir(cwd)


def test_best_configs_tables():
    """Spot-check the transcribed grid-search winners (load_configs.py)."""
    args = get_link_prediction_args(
        ["--model_name", "DyGFormer", "--dataset_name", "lastfm", "--load_best_configs"]
    )
    assert (args.max_input_sequence_length, args.patch_size) == (512, 16)
    args = get_link_prediction_args(
        ["--model_name", "DyGFormer", "--dataset_name", "CanParl", "--load_best_configs"]
    )
    assert (args.max_input_sequence_length, args.patch_size) == (2048, 64)
    args = get_link_prediction_args(
        ["--model_name", "CAWN", "--dataset_name", "lastfm", "--load_best_configs"]
    )
    assert args.num_neighbors == 128
    assert args.sample_neighbor_strategy == "time_interval_aware"
    args = get_link_prediction_args(
        ["--model_name", "GraphMixer", "--dataset_name", "wikipedia", "--load_best_configs"]
    )
    assert args.num_neighbors == 30 and args.dropout == 0.5
    args = get_node_classification_args(
        ["--model_name", "TGN", "--dataset_name", "reddit", "--load_best_configs"]
    )
    assert args.num_neighbors == 10 and args.num_layers == 1


@pytest.mark.slow
def test_node_cls_evaluation_replays_when_state_missing(workdir):
    """run_node_classification_evaluation must rebuild memory by replaying
    train+val chronologically when the head checkpoint carries no state —
    never silently evaluate test on cold memory."""
    import pickle

    from dyglib_tpu.runners import run_node_classification_evaluation

    wd, data_root = workdir
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        argv = _argv(
            data_root, ["--model_name", "JODIE", "--num_neighbors", "10"]
        )
        lp_args = get_link_prediction_args(argv)
        run_link_prediction_training(lp_args)
        nc_args = get_node_classification_args(argv)
        run_node_classification_training(nc_args)

        head_ckpt = (
            "saved_models/JODIE/synthetic/JODIE_seed0/"
            "JODIE_seed0_node_classification.pkl"
        )
        with open(head_ckpt, "rb") as f:
            payload = pickle.load(f)
        auc_with_state = run_node_classification_evaluation(nc_args)
        assert np.isfinite(auc_with_state["test"]["roc_auc"][0])

        # strip the memory state and re-evaluate: the replay path must run
        payload["state"] = None
        with open(head_ckpt, "wb") as f:
            pickle.dump(payload, f)
        auc_replayed = run_node_classification_evaluation(nc_args)
        a = auc_replayed["test"]["roc_auc"][0]
        assert np.isfinite(a) and 0.0 <= a <= 1.0
        # the replayed state reproduces the saved state's metrics exactly:
        # both are the post-val chronological memory under eval determinism
        np.testing.assert_allclose(
            a, auc_with_state["test"]["roc_auc"][0], atol=1e-6
        )
    finally:
        os.chdir(cwd)


@pytest.mark.slow
def test_node_cls_scan_mode_matches_loop(link_data, tmp_path):
    """scan_epochs node-classification == the per-batch loop (losses and
    global AUC), mirroring the link-prediction scan-mode contract."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dyglib_tpu.data.datasets import NodeClassificationData
    from dyglib_tpu.models import TGAT
    from dyglib_tpu.train import TrainConfig
    from dyglib_tpu.train.node_classification import NodeClassificationTrainer

    d = link_data
    nc_data = NodeClassificationData(
        node_raw_features=d.node_raw_features,
        edge_raw_features=d.edge_raw_features,
        full=d.full, train=d.train, val=d.val, test=d.test,
    )
    bk = TGAT(num_neighbors=5, num_layers=1)
    from dyglib_tpu.graph import build_temporal_csr

    csr = build_temporal_csr(d.train, num_nodes=d.num_nodes)
    tables_np = (jnp.asarray(d.node_raw_features), jnp.asarray(d.edge_raw_features))
    from dyglib_tpu.models.base import FeatureTables

    params = bk.init(jax.random.PRNGKey(0),
                     FeatureTables(node=tables_np[0], edge=tables_np[1]), csr)

    def run(scan):
        cfg = TrainConfig(batch_size=200, num_epochs=2, patience=5,
                          learning_rate=1e-3, scan_epochs=scan)
        tr = NodeClassificationTrainer(
            TGAT(num_neighbors=5, num_layers=1), nc_data, cfg,
            str(tmp_path / f"nc_{scan}.pkl"), params,
        )
        return tr.fit(seed=0, log=lambda *a: None)

    r_loop = run(False)
    r_scan = run(True)
    np.testing.assert_allclose(
        r_loop["test metrics"]["roc_auc"], r_scan["test metrics"]["roc_auc"],
        atol=2e-3,
    )


@pytest.mark.slow
def test_node_cls_pair_aware_triple_matches_quad(link_data, tmp_path):
    """Pair-aware node-cls embeddings: the triple [src||dst||dst] layout
    (triple_expand) equals the quad [src||dst||src||dst] exactly."""
    import jax
    import jax.numpy as jnp

    from dyglib_tpu.data.datasets import NodeClassificationData
    from dyglib_tpu.graph import build_temporal_csr
    from dyglib_tpu.models import DyGFormer
    from dyglib_tpu.models.base import FeatureTables
    from dyglib_tpu.train import TrainConfig
    from dyglib_tpu.train.node_classification import NodeClassificationTrainer

    d = link_data
    nc_data = NodeClassificationData(
        node_raw_features=d.node_raw_features,
        edge_raw_features=d.edge_raw_features,
        full=d.full, train=d.train, val=d.val, test=d.test,
    )
    bk = DyGFormer(max_input_sequence_length=16, patch_size=2, num_layers=1,
                   dropout=0.0)
    csr = build_temporal_csr(d.train, num_nodes=d.num_nodes)
    tables = FeatureTables(
        node=jnp.asarray(d.node_raw_features),
        edge=jnp.asarray(d.edge_raw_features),
    )
    params = bk.init(jax.random.PRNGKey(0), tables, csr)
    cfg = TrainConfig(batch_size=64, num_epochs=1, sequence_buckets=False)
    tr = NodeClassificationTrainer(
        bk, nc_data, cfg, str(tmp_path / "nc3.pkl"), params
    )
    from dyglib_tpu.data.batching import chronological_batches

    b = next(chronological_batches(d.train, 64))
    arrays = tr._batch_arrays(b)
    key = jax.random.PRNGKey(7)
    e3, _ = tr._src_embeddings(tr.full_csr, tr.tables, arrays, key, None)
    bk.triple_expand = False
    try:
        e4, _ = tr._src_embeddings(tr.full_csr, tr.tables, arrays, key, None)
    finally:
        bk.triple_expand = True
    np.testing.assert_allclose(np.asarray(e3), np.asarray(e4), atol=1e-5)


@pytest.mark.slow
def test_node_cls_discriminative_auc_floor(tmp_path):
    """Band-derived discriminative check (round 5, VERDICT r4 #2/#3).

    The ref-vs-ours node-classification calibration
    (scripts/nodecls_calibration.py, CALIBRATION.json::node_cls) put a
    trained-backbone + 10-epoch head at global val AUC 0.80-0.92 on a
    LEARNABLE relabeled dataset (flagged src nodes carry label 1 w.p.
    0.8 vs 0.02). This cheap version — frozen RANDOM-init backbone,
    5 head epochs — must still separate flagged nodes far above chance
    (embeddings encode node identity through the raw node features), so
    wrong-embedding-row / head-init / label-alignment bugs that
    finiteness checks cannot catch fail it. Floor 0.70 is ~3 combined
    sigma below the weakest calibrated arm at a strictly easier
    protocol than this one's (fewer epochs, untrained backbone).
    """
    import jax
    import pandas as pd

    from dyglib_tpu.data import (
        get_link_prediction_data,
        get_node_classification_data,
        write_synthetic_dataset,
    )
    from dyglib_tpu.models import TGAT
    from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig
    from dyglib_tpu.train.node_classification import NodeClassificationTrainer

    root = str(tmp_path / "nc")
    write_synthetic_dataset(root, "s", num_src=120, num_dst=60,
                            num_edges=4000, node_feat_scale=1.0, seed=7)
    csv = os.path.join(root, "s", "ml_s.csv")
    df = pd.read_csv(csv)
    rs = np.random.RandomState(777)
    src_ids = np.sort(df["u"].unique())
    flagged = set(rs.choice(src_ids, size=max(2, len(src_ids) // 8),
                            replace=False))
    p = np.where(df["u"].isin(flagged), 0.8, 0.02)
    df["label"] = (rs.uniform(size=len(df)) < p).astype(np.float64)
    df.to_csv(csv, index=False)

    link = get_link_prediction_data("s", data_root=root)
    nc = get_node_classification_data("s", data_root=root)
    bk = TGAT(num_neighbors=10, num_layers=1)
    lp = LinkPredictionTrainer(
        bk, link, TrainConfig(batch_size=100), str(tmp_path / "lp.pkl")
    )
    params, _ = lp.init_params(0)  # RANDOM backbone — no training
    tr = NodeClassificationTrainer(
        bk, nc,
        TrainConfig(batch_size=100, num_epochs=5, learning_rate=1e-3,
                    patience=6),
        str(tmp_path / "nc.pkl"), params["backbone"],
    )
    res = tr.fit(seed=0, log=lambda *a: None)
    auc = res["validate metrics"]["roc_auc"]
    assert np.isfinite(auc)
    assert auc >= 0.70, f"discriminative node-cls AUC too low: {auc:.4f}"
