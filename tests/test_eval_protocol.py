"""Random-strategy eval protocol guard (VERDICT r3 #1).

The shipped reference DISCARDS the sampled neg_src for the random
strategy and scores the negative edge as (src, neg_dst)
(evaluate_models_utils.py:61-63) — the protocol behind every headline AP.
Rounds 1-3 scored (sampled_neg_src, neg_dst); this test pins the fix.
"""
import numpy as np
import pytest

from dyglib_tpu.models import GraphMixer
from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig


def test_random_strategy_scores_src_negdst(link_data, tmp_path):
    backbone = GraphMixer(num_neighbors=5, num_layers=1, time_gap=32)
    cfg = TrainConfig(batch_size=64, num_epochs=1)
    tr = LinkPredictionTrainer(
        backbone, link_data, cfg, str(tmp_path / "ck.pkl")
    )
    captured = []
    orig = tr._batch_arrays

    def spy(b, ns, nd):
        captured.append((b, np.asarray(ns), np.asarray(nd)))
        return orig(b, ns, nd)

    tr._batch_arrays = spy

    class PoisonNegs:
        """Sampler whose neg_src draw is a sentinel that must be discarded."""

        negative_sample_strategy = "random"
        seed = 0

        def reset_random_state(self):
            self._rs = np.random.RandomState(0)

        def sample(self, size, **_):
            # neg_src = junk sentinel; neg_dst = a real draw
            return (
                np.full(size, -12345, dtype=np.int64),
                self._rs.choice(np.unique(link_data.full.dst), size=size),
            )

    params, _ = tr.init_params(0)
    tr.evaluate(params, link_data.val, PoisonNegs(), 0)
    assert captured, "evaluate() never staged a batch"
    for b, ns, nd in captured:
        n = b.num_valid
        # the sentinel must never be scored: neg_src rows == batch src rows
        np.testing.assert_array_equal(ns[:n], b.src[:n])
        assert not np.any(ns == -12345)
