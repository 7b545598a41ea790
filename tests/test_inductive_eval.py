"""Inductive negative sampling through the full eval pipeline with a
memory model (the hardest evaluation arm: set-algebraic negatives +
stateful sweeps)."""
import numpy as np

from dyglib_tpu.graph import NegativeEdgeSampler
from dyglib_tpu.models import MemoryModel
from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig


def test_tgn_inductive_negative_evaluation(link_data, tmp_path):
    d = link_data
    backbone = MemoryModel(model_name="TGN", num_neighbors=5, num_layers=1)
    cfg = TrainConfig(batch_size=200, num_epochs=1, learning_rate=1e-3)
    tr = LinkPredictionTrainer(backbone, d, cfg, str(tmp_path / "t.pkl"))
    params, opt_state = tr.init_params(0)
    import jax

    params, opt_state, state, _, _ = tr.train_epoch(
        params, opt_state, tr.init_state(), 0, jax.random.PRNGKey(0)
    )

    # inductive sampler layout from the reference eval driver
    # (evaluate_link_prediction.py:41-52): last_observed_time = train end
    ind = NegativeEdgeSampler(
        d.full.src, d.full.dst, interact_times=d.full.ts,
        last_observed_time=float(d.train.ts[-1]),
        negative_sample_strategy="inductive", seed=2,
    )
    losses, metrics, state2 = tr.evaluate(params, d.test, ind, 2, state=state)
    assert len(metrics) > 0
    aps = [m["average_precision"] for m in metrics]
    assert np.isfinite(aps).all()
    # memory advanced through the sweep
    assert (
        np.asarray(state2.last_update).max()
        >= np.asarray(state.last_update).max()
    )
    # determinism under seeded inductive negatives
    _, metrics_b, _ = tr.evaluate(params, d.test, ind, 2, state=state)
    np.testing.assert_allclose(
        aps, [m["average_precision"] for m in metrics_b], atol=1e-9
    )
