"""End-to-end slice: TGAT + link-prediction trainer on synthetic data."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier (see pytest.ini)

from dyglib_tpu.models import TGAT
from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig


@pytest.fixture(scope="module")
def trained(link_data, tmp_path_factory):
    save = tmp_path_factory.mktemp("ckpt") / "tgat.pkl"
    backbone = TGAT(num_neighbors=10, num_layers=2, time_feat_dim=100)
    cfg = TrainConfig(
        batch_size=200, num_epochs=4, patience=5, learning_rate=1e-3
    )
    trainer = LinkPredictionTrainer(backbone, link_data, cfg, str(save))
    results = trainer.fit(seed=0, log=lambda *a: None)
    return trainer, results


def test_training_learns(trained):
    trainer, results = trained
    # band floor (tests/calibration_fixture.json, re-derived round 4 under
    # the shipped neg_src=src eval protocol): ours 0.6171 +- 0.0078 over
    # 5 seeds, ref 0.6395 +- 0.0214 -> mean - max(3 sigma, 0.03) = 0.587.
    ap = results["test metrics"]["average_precision"]
    auc = results["test metrics"]["roc_auc"]
    assert ap > 0.58, f"test AP {ap}"
    assert auc > 0.57, f"test AUC {auc}"
    # all four splits reported, in [0, 1]
    for split in (
        "validate metrics",
        "new node validate metrics",
        "test metrics",
        "new node test metrics",
    ):
        for v in results[split].values():
            assert 0.0 <= v <= 1.0


def test_eval_determinism(trained):
    """Seeded eval negatives + fixed keys -> identical metrics across sweeps
    (the reference resets sampler RNG before each eval, utils/utils.py:490)."""
    trainer, results = trained
    params = results["params"]
    _, m1, _ = trainer.evaluate(params, trainer.data.val, trainer.val_neg, 0)
    _, m2, _ = trainer.evaluate(params, trainer.data.val, trainer.val_neg, 0)
    a1 = [m["average_precision"] for m in m1]
    a2 = [m["average_precision"] for m in m2]
    assert np.allclose(a1, a2)


def test_checkpoint_roundtrip(trained, tmp_path):
    from dyglib_tpu.train import load_checkpoint, save_checkpoint

    trainer, results = trained
    p = tmp_path / "ck.pkl"
    save_checkpoint(str(p), results["params"])
    loaded = load_checkpoint(str(p))
    import jax

    leaves1 = jax.tree_util.tree_leaves(results["params"])
    leaves2 = jax.tree_util.tree_leaves(loaded["params"])
    assert all(np.array_equal(np.asarray(a), b) for a, b in zip(leaves1, leaves2))
