"""Test configuration: force an 8-device CPU mesh before JAX is imported.

Multi-chip sharding is validated on virtual CPU devices
(``--xla_force_host_platform_device_count``); benchmarks run on the real
TPU chip separately.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# NOTE: the environment pins JAX_PLATFORMS=axon (TPU tunnel) and the axon
# site hook re-applies it, so the env var alone is not enough — the config
# update below is what actually forces CPU for tests.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_dataset(tmp_path_factory):
    """A small synthetic bipartite dataset in the processed layout."""
    from dyglib_tpu.data import write_synthetic_dataset

    root = tmp_path_factory.mktemp("processed_data")
    write_synthetic_dataset(
        str(root), "synthetic", num_src=120, num_dst=60, num_edges=2000,
        node_feat_scale=1.0, seed=7,
    )
    return str(root)


@pytest.fixture(scope="session")
def link_data(synthetic_dataset):
    from dyglib_tpu.data import get_link_prediction_data

    return get_link_prediction_data("synthetic", data_root=synthetic_dataset)
