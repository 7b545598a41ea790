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


def test_eval_dedup_matches_quad_exactly(link_data, tmp_path):
    """Random-strategy eval with the triple dedup == the full quad
    (neg_src = src and 'recent' sampling make the reused src column
    bit-identical to what the quad would recompute)."""
    import dataclasses

    backbone = GraphMixer(num_neighbors=5, num_layers=1, time_gap=32)
    cfg = TrainConfig(batch_size=64, num_epochs=1)
    tr = LinkPredictionTrainer(
        backbone, link_data, cfg, str(tmp_path / "ck.pkl")
    )
    params, _ = tr.init_params(0)
    _, m_dedup, _ = tr.evaluate(params, link_data.val, tr.val_neg, 0)

    quad = dataclasses.replace(backbone, pair_independent=False)
    tr2 = LinkPredictionTrainer(
        quad, link_data, cfg, str(tmp_path / "ck2.pkl")
    )
    _, m_quad, _ = tr2.evaluate(params, link_data.val, tr2.val_neg, 0)
    a = [m["average_precision"] for m in m_dedup]
    b = [m["average_precision"] for m in m_quad]
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)


def test_eval_dedup_memory_model_state_exact(link_data, tmp_path):
    """TGN eval with the triple dedup: metrics AND committed memory state
    bitwise-equal to the quad path (the state commit consumes the src/dst
    columns, which the triple carries verbatim)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dyglib_tpu.models import MemoryModel, compute_src_dst_node_time_shifts

    d = link_data
    shifts = compute_src_dst_node_time_shifts(d.train.src, d.train.dst, d.train.ts)
    bk = MemoryModel(model_name="TGN", num_neighbors=5, num_layers=1,
                     time_shifts=shifts)
    cfg = TrainConfig(batch_size=64, num_epochs=1)
    tr = LinkPredictionTrainer(bk, d, cfg, str(tmp_path / "a.pkl"))
    params, _ = tr.init_params(0)
    state = tr.init_state()
    _, m1, s1 = tr.evaluate(params, d.val, tr.val_neg, 0, state=state)
    quad = dataclasses.replace(bk, pair_independent=False)
    tr2 = LinkPredictionTrainer(quad, d, cfg, str(tmp_path / "b.pkl"))
    _, m2, s2 = tr2.evaluate(params, d.val, tr2.val_neg, 0, state=state)
    a = [m["average_precision"] for m in m1]
    b = [m["average_precision"] for m in m2]
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)
    for x, y in zip(jax.tree_util.tree_leaves(s1), jax.tree_util.tree_leaves(s2)):
        xf = jnp.asarray(x).astype(jnp.float32)
        yf = jnp.asarray(y).astype(jnp.float32)
        assert float(jnp.abs(xf - yf).max()) == 0.0
