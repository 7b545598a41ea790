"""Dynamic link prediction: training + evaluation loops.

Behavioral parity target: train_link_prediction.py:28-501 and
evaluate_models_utils.py:19-154 of the reference.

Choreography preserved:
  * chronological batches, shuffle never (train_link_prediction.py:57-61);
  * train negatives: only destinations resampled, neg_src = src
    (train_link_prediction.py:164-166); eval negatives: (neg_src, neg_dst)
    both drawn from the split's seeded sampler, with batch time-range plumbed
    through for historical/inductive strategies
    (evaluate_models_utils.py:55-66);
  * loss = mean BCE over [positives || negatives]
    (train_link_prediction.py:243-249) — computed on logits here, same math;
  * metrics per batch, averaged across batches (train:302-309);
  * early stopping when ALL val metrics stop improving (train:349-355);
  * train graph for training, full graph for evaluation (train:148-150,
    evaluate_models_utils.py:39-41);
  * eval negative samplers reset to their seed before each sweep
    (evaluate_models_utils.py:36-37).

TPU-native deviations: the whole step (neighbor sampling + forward + loss +
backward + update) is one jitted program on static shapes; positives and
negatives are embedded in one 4B-row forward; padded tail rows are masked
out of loss and metrics.
"""
from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.batching import Batch, chronological_batches
from ..data.containers import EdgeStream
from ..data.datasets import LinkPredictionData
from ..graph.csr import TemporalCSR, build_temporal_csr, time_keys
from ..graph.neg_sampler import NegativeEdgeSampler
from ..models.base import FeatureTables
from ..nn.modules import MergeLayer
from .early_stopping import EarlyStopping
from .metrics import link_prediction_metrics


@dataclasses.dataclass
class TrainConfig:
    batch_size: int = 200
    num_epochs: int = 100
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    optimizer: str = "adam"
    patience: int = 20
    test_interval_epochs: int = 10
    val_ratio: float = 0.15
    test_ratio: float = 0.15
    time_scaling_factor: float = 1e-6


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam / SGD / RMSprop, matching create_optimizer (utils/utils.py:50-68)."""
    if cfg.optimizer == "adam":
        return optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay) \
            if cfg.weight_decay else optax.adam(cfg.learning_rate)
    if cfg.optimizer == "sgd":
        return optax.sgd(cfg.learning_rate)
    if cfg.optimizer == "rmsprop":
        return optax.rmsprop(cfg.learning_rate)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")


class LinkPredictionTrainer:
    """Owns the jitted steps + host loop for one backbone on one dataset."""

    def __init__(
        self,
        backbone,
        data: LinkPredictionData,
        cfg: TrainConfig,
        save_path: str,
        rich_negatives: bool = False,
    ):
        self.backbone = backbone
        self.data = data
        self.cfg = cfg
        self.save_path = save_path

        self.tables = FeatureTables(
            node=jnp.asarray(data.node_raw_features),
            edge=jnp.asarray(data.edge_raw_features),
        )
        with_tia = getattr(backbone, "sample_strategy", "recent") == "time_interval_aware"
        self.train_csr = build_temporal_csr(
            data.train, num_nodes=data.num_nodes,
            time_scaling_factor=cfg.time_scaling_factor, with_tia=with_tia,
        )
        self.full_csr = build_temporal_csr(
            data.full, num_nodes=data.num_nodes,
            time_scaling_factor=cfg.time_scaling_factor, with_tia=with_tia,
        )

        self.head = MergeLayer(hidden_dim=self.tables.node_dim, output_dim=1)

        # negative samplers with the reference's seed layout
        # (train unseeded; val/nn-val/test/nn-test = 0/1/2/3,
        #  train_link_prediction.py:49-54)
        d = data
        self.train_neg = NegativeEdgeSampler(d.train.src, d.train.dst)
        self.val_neg = NegativeEdgeSampler(d.full.src, d.full.dst, seed=0)
        self.nn_val_neg = NegativeEdgeSampler(
            d.new_node_val.src, d.new_node_val.dst, seed=1
        )
        self.test_neg = NegativeEdgeSampler(d.full.src, d.full.dst, seed=2)
        self.nn_test_neg = NegativeEdgeSampler(
            d.new_node_test.src, d.new_node_test.dst, seed=3
        )
        self.optim = make_optimizer(cfg)
        self._build_steps()

    # ---------------------------------------------------------------- jitted
    def _embed_quad(self, params, csr, ids4, ts4, key, train, state):
        """One batched forward over [src || dst || neg_src || neg_dst]."""
        sample_key, dropout_key = jax.random.split(key)
        inputs = self.backbone.sample(csr, ids4, ts4, sample_key)
        rngs = {"dropout": dropout_key} if train else None
        embs = self.backbone.apply(
            params["backbone"], self.tables, inputs,
            state=state, train=train, rngs=rngs,
        )
        return jnp.split(embs, 4, axis=0)

    def _logits(self, params, src_e, dst_e):
        return self.head.apply(params["head"], src_e, dst_e)[..., 0]

    def _loss_and_probs(self, params, csr, batch, key, train, state):
        src, dst, neg_src, neg_dst, ts, valid = batch
        ids4 = jnp.concatenate([src, dst, neg_src, neg_dst])
        ts4 = jnp.tile(ts, 4)
        s_e, d_e, ns_e, nd_e = self._embed_quad(
            params, csr, ids4, ts4, key, train, state
        )
        pos_logit = self._logits(params, s_e, d_e)
        neg_logit = self._logits(params, ns_e, nd_e)
        bce_pos = optax.sigmoid_binary_cross_entropy(pos_logit, jnp.ones_like(pos_logit))
        bce_neg = optax.sigmoid_binary_cross_entropy(neg_logit, jnp.zeros_like(neg_logit))
        denom = jnp.maximum(2.0 * valid.sum(), 1.0)
        loss = ((bce_pos + bce_neg) * valid).sum() / denom
        return loss, (jax.nn.sigmoid(pos_logit), jax.nn.sigmoid(neg_logit))

    def _build_steps(self):
        def train_step(params, opt_state, csr, batch, key):
            (loss, probs), grads = jax.value_and_grad(
                self._loss_and_probs, has_aux=True
            )(params, csr, batch, key, True, None)
            updates, opt_state = self.optim.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, probs

        def eval_step(params, csr, batch, key):
            return self._loss_and_probs(params, csr, batch, key, False, None)

        self.train_step = jax.jit(train_step)
        self.eval_step = jax.jit(eval_step)

    # ----------------------------------------------------------------- setup
    def init_params(self, seed: int):
        key = jax.random.PRNGKey(seed)
        k_backbone, k_head = jax.random.split(key)
        params = {
            "backbone": self.backbone.init(k_backbone, self.tables, self.train_csr),
            "head": self.head.init(
                k_head,
                jnp.zeros((1, self.tables.node_dim)),
                jnp.zeros((1, self.tables.node_dim)),
            ),
        }
        opt_state = self.optim.init(params)
        return params, opt_state

    # ------------------------------------------------------------------ loops
    def _batch_arrays(self, b: Batch, neg_src, neg_dst):
        return (
            jnp.asarray(b.src, jnp.int32),
            jnp.asarray(b.dst, jnp.int32),
            jnp.asarray(neg_src, jnp.int32),
            jnp.asarray(neg_dst, jnp.int32),
            jnp.asarray(time_keys(b.ts), jnp.int32),
            jnp.asarray(b.valid, jnp.float32),
        )

    def _pad_negs(self, neg: np.ndarray, b: Batch) -> np.ndarray:
        out = np.zeros(len(b.src), dtype=np.int64)
        out[: len(neg)] = neg
        if len(neg) < len(out):
            out[len(neg):] = neg[-1] if len(neg) else 0
        return out

    def _batch_metrics(self, probs, batch: Batch):
        n = batch.num_valid
        pos = np.asarray(probs[0])[:n]
        neg = np.asarray(probs[1])[:n]
        predicts = np.concatenate([pos, neg])
        labels = np.concatenate([np.ones(n), np.zeros(n)])
        return link_prediction_metrics(predicts, labels)

    def train_epoch(self, params, opt_state, epoch: int, root_key) -> tuple:
        losses, metrics = [], []
        for i, b in enumerate(
            chronological_batches(self.data.train, self.cfg.batch_size)
        ):
            _, neg_dst = self.train_neg.sample(b.num_valid)
            neg_dst = self._pad_negs(neg_dst, b)
            neg_src = b.src  # train negatives keep the source (train:164-166)
            arrays = self._batch_arrays(b, neg_src, neg_dst)
            key = jax.random.fold_in(jax.random.fold_in(root_key, epoch), i)
            params, opt_state, loss, probs = self.train_step(
                params, opt_state, self.train_csr, arrays, key
            )
            losses.append(float(loss))
            metrics.append(self._batch_metrics(probs, b))
        return params, opt_state, losses, metrics

    def evaluate(
        self,
        params,
        stream: EdgeStream,
        neg_sampler: NegativeEdgeSampler,
        eval_key_salt: int = 0,
    ) -> tuple[list[float], list[dict]]:
        """One sweep over a split (evaluate_models_utils.py:19-154)."""
        if stream.num_interactions == 0:
            return [], []
        neg_sampler.reset_random_state()
        losses, metrics = [], []
        key = jax.random.PRNGKey(12345 + eval_key_salt)
        for i, b in enumerate(chronological_batches(stream, self.cfg.batch_size)):
            n = b.num_valid
            if neg_sampler.negative_sample_strategy != "random":
                neg_src, neg_dst = neg_sampler.sample(
                    n,
                    batch_src_node_ids=b.src[:n],
                    batch_dst_node_ids=b.dst[:n],
                    current_batch_start_time=b.batch_start_time,
                    current_batch_end_time=b.batch_end_time,
                )
            else:
                neg_src, neg_dst = neg_sampler.sample(n)
            arrays = self._batch_arrays(
                b, self._pad_negs(neg_src, b), self._pad_negs(neg_dst, b)
            )
            loss, probs = self.eval_step(
                params, self.full_csr, arrays, jax.random.fold_in(key, i)
            )
            losses.append(float(loss))
            metrics.append(self._batch_metrics(probs, b))
        return losses, metrics

    @staticmethod
    def mean_metrics(metrics: list[dict]) -> dict[str, float]:
        if not metrics:
            return {}
        return {
            k: float(np.mean([m[k] for m in metrics])) for k in metrics[0]
        }

    def fit(self, seed: int = 0, log=print) -> dict:
        """Full reference choreography for one run; returns the results dict."""
        params, opt_state = self.init_params(seed)
        root_key = jax.random.PRNGKey(seed)
        early = EarlyStopping(self.cfg.patience, self.save_path)

        for epoch in range(self.cfg.num_epochs):
            t0 = time.time()
            params, opt_state, tr_losses, tr_metrics = self.train_epoch(
                params, opt_state, epoch, root_key
            )
            val_losses, val_metrics = self.evaluate(params, self.data.val, self.val_neg, 0)
            nn_val_losses, nn_val_metrics = self.evaluate(
                params, self.data.new_node_val, self.nn_val_neg, 1
            )
            log(
                f"epoch {epoch + 1}: train loss {np.mean(tr_losses):.4f} "
                f"ap {self.mean_metrics(tr_metrics).get('average_precision', 0):.4f} | "
                f"val {self.mean_metrics(val_metrics)} | "
                f"nn-val ap {self.mean_metrics(nn_val_metrics).get('average_precision', 0):.4f} "
                f"({time.time() - t0:.1f}s)"
            )
            if (epoch + 1) % self.cfg.test_interval_epochs == 0:
                test_losses, test_metrics = self.evaluate(
                    params, self.data.test, self.test_neg, 2
                )
                log(f"  test {self.mean_metrics(test_metrics)}")
            if early.step(self.mean_metrics(val_metrics), params):
                log(f"early stop at epoch {epoch + 1}")
                break

        best = early.load_best()
        params = jax.device_put(best["params"])

        results = {}
        val_losses, val_metrics = self.evaluate(params, self.data.val, self.val_neg, 0)
        nn_val_losses, nn_val_metrics = self.evaluate(
            params, self.data.new_node_val, self.nn_val_neg, 1
        )
        test_losses, test_metrics = self.evaluate(params, self.data.test, self.test_neg, 2)
        nn_test_losses, nn_test_metrics = self.evaluate(
            params, self.data.new_node_test, self.nn_test_neg, 3
        )
        results["validate metrics"] = self.mean_metrics(val_metrics)
        results["new node validate metrics"] = self.mean_metrics(nn_val_metrics)
        results["test metrics"] = self.mean_metrics(test_metrics)
        results["new node test metrics"] = self.mean_metrics(nn_test_metrics)
        results["params"] = params
        return results
