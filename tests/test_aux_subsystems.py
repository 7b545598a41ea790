"""Aux subsystems: TensorBoard event stream, orbax checkpoints, stats CLI."""
import os
import subprocess
import sys

import numpy as np
import pytest

from dyglib_tpu.train.checkpoints import load_checkpoint, save_checkpoint
from dyglib_tpu.utils.tensorboard import (
    SummaryWriter,
    crc32c,
    read_scalar_events,
)


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_summary_writer_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("train/loss", 0.5, step=1)
    w.add_scalars({"val/ap": 0.9, "val/auc": 0.8}, step=2)
    w.close()
    events = read_scalar_events(w.path)
    assert events[0] == (1, {"train/loss": 0.5})
    step, scalars = events[1]
    assert step == 2
    np.testing.assert_allclose(scalars["val/ap"], 0.9, rtol=1e-6)
    np.testing.assert_allclose(scalars["val/auc"], 0.8, rtol=1e-6)


@pytest.mark.slow
def test_trainer_emits_tensorboard(link_data, tmp_path):
    from dyglib_tpu.models import GraphMixer
    from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig

    tb_dir = str(tmp_path / "tb")
    cfg = TrainConfig(
        batch_size=200, num_epochs=2, learning_rate=1e-3,
        tensorboard_dir=tb_dir,
    )
    tr = LinkPredictionTrainer(
        GraphMixer(num_neighbors=10, num_layers=1), link_data, cfg,
        str(tmp_path / "ck.pkl"),
    )
    tr.fit(seed=0, log=lambda m: None)
    files = [f for f in os.listdir(tb_dir) if f.startswith("events.out")]
    assert files
    events = read_scalar_events(os.path.join(tb_dir, files[0]))
    assert len(events) == 2  # one scalar record per epoch
    tags = set(events[0][1])
    assert {"train/loss", "val/average_precision", "perf/edges_per_second"} <= tags


def test_orbax_checkpoint_roundtrip(tmp_path):
    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    state = {"memory": np.ones((4, 2), np.float32)}
    path = str(tmp_path / "ck_orbax")
    save_checkpoint(path, params, state, extra={"epoch": 3}, backend="orbax")
    assert os.path.isdir(path)
    ck = load_checkpoint(path)
    np.testing.assert_array_equal(ck["params"]["w"], params["w"])
    np.testing.assert_array_equal(ck["state"]["memory"], state["memory"])
    assert ck["extra"] == {"epoch": 3}


def test_statistics_cli(synthetic_dataset):
    out = subprocess.run(
        [sys.executable, "-m", "dyglib_tpu.data.statistics",
         "--data_root", synthetic_dataset],
        capture_output=True, text=True, env={**os.environ, "JAX_PLATFORMS": "cpu"},
        cwd="/root/repo", timeout=120,
    )
    assert out.returncode == 0, out.stderr
    lines = out.stdout.strip().splitlines()
    assert lines[0].split()[:3] == ["dataset", "num_nodes", "num_edges"]
    assert any("synthetic" in ln for ln in lines[1:])


def test_fast_prng_subprocess():
    """RBG PRNG: deterministic per seed, different impl than threefry."""
    code = (
        # force CPU via the config API: the axon site hook re-applies
        # JAX_PLATFORMS=axon, so the env var alone would make this
        # subprocess contend for the (single-tenant) TPU tunnel and hang
        # whenever another process holds it (see tests/conftest.py)
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from dyglib_tpu.utils import use_fast_prng\n"
        "use_fast_prng()\n"
        "k = jax.random.PRNGKey(0)\n"
        "a = jax.random.uniform(k, (4,))\n"
        "b = jax.random.uniform(jax.random.PRNGKey(0), (4,))\n"
        "import numpy as np\n"
        "assert np.array_equal(np.asarray(a), np.asarray(b))\n"
        "assert k.shape == (4,)  # rbg keys are 4x uint32\n"
        "print('OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"}, cwd="/root/repo", timeout=600,
    )
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout


def test_coupled_weight_decay_matches_torch():
    """make_optimizer's weight_decay must reproduce torch.optim.Adam's COUPLED
    L2-into-gradient semantics (utils/utils.py:50-68), not AdamW's decoupled
    decay — a silent parity break if anyone sets --weight_decay > 0."""
    import jax.numpy as jnp
    import optax
    import pytest
    import torch

    from dyglib_tpu.train.link_prediction import TrainConfig, make_optimizer

    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(5, 3)).astype(np.float32)
    lr, wd, steps = 1e-2, 0.3, 5

    # torch: Adam with coupled weight decay on a fixed synthetic gradient
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([tw], lr=lr, weight_decay=wd)
    grads = [rng.normal(size=w0.shape).astype(np.float32) for _ in range(steps)]
    for g in grads:
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        opt.step()

    # ours
    cfg = TrainConfig(learning_rate=lr, weight_decay=wd, optimizer="adam")
    tx = make_optimizer(cfg)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), tw.detach().numpy(), atol=1e-6
    )

    # and that DECOUPLED decay (adamw) would NOT match — the test is sharp
    tx2 = optax.adamw(lr, weight_decay=wd)
    params2 = {"w": jnp.asarray(w0)}
    state2 = tx2.init(params2)
    for g in grads:
        updates2, state2 = tx2.update({"w": jnp.asarray(g)}, state2, params2)
        params2 = optax.apply_updates(params2, updates2)
    with pytest.raises(AssertionError):
        np.testing.assert_allclose(
            np.asarray(params2["w"]), tw.detach().numpy(), atol=1e-6
        )
