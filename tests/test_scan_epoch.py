"""Scan-mode epoch == per-batch loop epoch under identical negatives."""
import pytest
import jax
import numpy as np

from dyglib_tpu.graph import NegativeEdgeSampler
from dyglib_tpu.models import TGAT, MemoryModel
from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig


def _trainer(backbone, link_data, tmp_path, name):
    cfg = TrainConfig(batch_size=200, num_epochs=1, learning_rate=1e-3)
    tr = LinkPredictionTrainer(backbone, link_data, cfg, str(tmp_path / name))
    # seeded train negatives so both modes see identical streams
    tr.train_neg = NegativeEdgeSampler(
        link_data.train.src, link_data.train.dst, seed=42
    )
    return tr


def test_scan_epoch_matches_loop_tgat(link_data, tmp_path):
    backbone = TGAT(num_neighbors=5, num_layers=1)
    tr = _trainer(backbone, link_data, tmp_path, "a.pkl")
    root = jax.random.PRNGKey(0)

    params, opt_state = tr.init_params(0)
    tr.train_neg.reset_random_state()
    p1, o1, _, losses1, m1 = tr.train_epoch(params, opt_state, None, 0, root)

    params, opt_state = tr.init_params(0)
    tr.train_neg.reset_random_state()
    p2, o2, _, losses2, m2 = tr.train_epoch_scanned(params, opt_state, None, 0, root)

    np.testing.assert_allclose(losses1, losses2, atol=1e-5)
    l1 = jax.tree_util.tree_leaves(p1)
    l2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_scan_epoch_memory_model(link_data, tmp_path):
    backbone = MemoryModel(model_name="TGN", num_neighbors=5, num_layers=1)
    tr = _trainer(backbone, link_data, tmp_path, "b.pkl")
    root = jax.random.PRNGKey(0)

    params, opt_state = tr.init_params(0)
    tr.train_neg.reset_random_state()
    p1, o1, s1, losses1, _ = tr.train_epoch(
        params, opt_state, tr.init_state(), 0, root
    )

    params, opt_state = tr.init_params(0)
    tr.train_neg.reset_random_state()
    p2, o2, s2, losses2, _ = tr.train_epoch_scanned(
        params, opt_state, tr.init_state(), 0, root
    )
    np.testing.assert_allclose(losses1, losses2, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s1.memory), np.asarray(s2.memory), atol=1e-5
    )


def test_eval_scan_matches_loop(link_data, tmp_path):
    """Scanned evaluation sweep == per-batch loop: losses, metrics, state."""
    for backbone, tag in (
        (TGAT(num_neighbors=5, num_layers=1), "tgat"),
        (MemoryModel(model_name="TGN", num_neighbors=5, num_layers=1), "tgn"),
    ):
        tr = _trainer(backbone, link_data, tmp_path, f"ev_{tag}.pkl")
        params, _ = tr.init_params(0)
        state0 = tr.init_state()

        l1, m1, s1 = tr.evaluate(
            params, link_data.val, tr.val_neg, 0, state=state0, scanned=False
        )
        state0 = tr.init_state()
        l2, m2, s2 = tr.evaluate(
            params, link_data.val, tr.val_neg, 0, state=state0, scanned=True
        )
        np.testing.assert_allclose(l1, l2, atol=1e-6)
        for a, b in zip(m1, m2):
            for k in a:
                np.testing.assert_allclose(a[k], b[k], atol=1e-6)
        if s1 is not None:
            np.testing.assert_allclose(
                np.asarray(s1.memory), np.asarray(s2.memory), atol=1e-6
            )
