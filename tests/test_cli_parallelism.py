"""CLI scale-out flags: mesh construction + full sharded training run."""
import os

import jax
import numpy as np
import pytest

from dyglib_tpu.configs import get_link_prediction_args
from dyglib_tpu.runners import (
    run_link_prediction_training,
    setup_parallelism,
    train_config_from_args,
)


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


def test_setup_parallelism_default_single_device(synthetic_dataset):
    args = get_link_prediction_args(_argv(synthetic_dataset, []))
    mesh, is_lead = setup_parallelism(args)
    assert mesh is None and is_lead


def test_setup_parallelism_builds_mesh(synthetic_dataset):
    args = get_link_prediction_args(
        _argv(synthetic_dataset, ["--data_parallelism", "4", "--model_parallelism", "2"])
    )
    mesh, is_lead = setup_parallelism(args)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    assert is_lead

    args_all = get_link_prediction_args(
        _argv(synthetic_dataset, ["--data_parallelism", "-1"])
    )
    mesh_all, _ = setup_parallelism(args_all)
    assert mesh_all.devices.size == len(jax.devices())


def test_config_flags_threaded(synthetic_dataset):
    args = get_link_prediction_args(
        _argv(synthetic_dataset, ["--scan_epochs", "--no_sequence_buckets"])
    )
    cfg = train_config_from_args(args)
    assert cfg.scan_epochs and not cfg.sequence_buckets


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_cli_training_on_mesh(tmp_path, synthetic_dataset):
    """End-to-end CLI training run sharded over the full 8-device mesh."""
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        args = get_link_prediction_args(
            _argv(
                synthetic_dataset,
                [
                    "--model_name", "GraphMixer", "--num_neighbors", "10",
                    "--num_layers", "1",
                    "--data_parallelism", "4", "--model_parallelism", "2",
                ],
            )
        )
        agg = run_link_prediction_training(args)
        ap_mean, _ = agg["test"]["average_precision"]
        assert 0.4 < ap_mean <= 1.0
    finally:
        os.chdir(cwd)
