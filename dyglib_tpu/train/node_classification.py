"""Dynamic node classification: frozen backbone + MLPClassifier head.

Behavioral parity target: train_node_classification.py:28-368 and
evaluate_models_utils.py:157-242.

Choreography preserved:
  * the backbone is initialized from a LINK-PREDICTION checkpoint
    (train_node_classification.py:116-120) and FROZEN — the optimizer sees
    only the MLPClassifier head, embeddings are computed without gradients
    (train:129-151, 172);
  * the head is trained with BCE on the SOURCE node embedding against the
    edge label (train:164-230);
  * metric = ROC-AUC computed GLOBALLY over the split, not per batch
    (evaluate_models_utils.py:236-240 — the reference's deliberate
    asymmetry vs link prediction);
  * memory models: memory re-initialized each epoch, every edge commits
    (the stream is replayed chronologically), val/test continue from the
    train-sweep state.
"""
from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.batching import Batch, chronological_batches
from ..data.containers import EdgeStream
from ..data.datasets import NodeClassificationData
from ..graph.csr import build_temporal_csr, time_keys
from ..models.base import FeatureTables
from ..nn.modules import MLPClassifier
from .early_stopping import EarlyStopping
from .link_prediction import TrainConfig, make_optimizer
from .metrics import node_classification_metrics


class NodeClassificationTrainer:
    def __init__(
        self,
        backbone,
        data: NodeClassificationData,
        cfg: TrainConfig,
        save_path: str,
        backbone_params,
    ):
        self.backbone = backbone
        self.data = data
        self.cfg = cfg
        self.save_path = save_path
        self.has_state = getattr(backbone, "has_state", False)
        self.backbone_params = backbone_params  # frozen

        self.tables = FeatureTables(
            node=jnp.asarray(data.node_raw_features),
            edge=jnp.asarray(data.edge_raw_features),
        )
        with_tia = (
            getattr(backbone, "sample_strategy", "recent") == "time_interval_aware"
        )
        fpx = None
        if getattr(backbone, "wants_feat_prefix", False):
            table_bytes = (
                2 * data.full.num_interactions * data.node_raw_features.shape[1] * 4
            )
            if table_bytes <= 2_000_000_000:
                fpx = data.node_raw_features
        self.full_csr = build_temporal_csr(
            data.full, num_nodes=data.num_nodes,
            time_scaling_factor=cfg.time_scaling_factor, with_tia=with_tia,
            feat_prefix_of=fpx,
        )
        self.head = MLPClassifier(dropout=cfg.head_dropout)
        self.optim = make_optimizer(cfg)
        self._build_steps()

    # ---------------------------------------------------------------- jitted
    def _src_embeddings(self, csr, tables, batch, key, state):
        """Frozen-backbone source embeddings (+ state transition).

        Pair-aware backbones need a paired row layout: the triple
        [src||dst||dst] for deterministic-sampling nets (triple_expand —
        the duplicate pair costs nothing since per-row channels are shared;
        25% fewer rows than the quad), else the quad [src||dst||src||dst]
        (CAWN). Pair-independent ones embed only the rows actually
        consumed — src alone when stateless, src+dst when the memory
        commit needs both.
        """
        src, dst, ts, eid, valid = batch
        triple = False
        if getattr(self.backbone, "pair_independent", False):
            reps = 2 if self.has_state else 1
        elif getattr(self.backbone, "triple_expand", False):
            reps, triple = 3, True
        else:
            reps = 4
        ids = jnp.concatenate(
            ([src, dst, dst] if triple else [src, dst, src, dst])[:reps]
        )
        tsx = jnp.tile(ts, reps)
        inputs = self.backbone.sample(csr, ids, tsx, key)
        if self.has_state:
            from ..models.memory_model import segment_roles

            # [src || dst] 2-segment layout: explicit roles for JODIE's
            # per-role time-shift normalization (MemoryModel.py:111-124)
            # roles must track the ACTUAL row layout (triple = [src||dst||dst])
            layout = ("src", "dst", "dst") if triple else ("src", "dst", "src", "dst")
            inputs = inputs._replace(
                roles=segment_roles(src.shape[0], layout[:reps])
            )
            embs4, new_state = self.backbone.forward_and_maybe_commit(
                self.backbone_params, tables, state, inputs,
                src, dst, ts, eid, valid,
                edges_are_positive=True, train=False, rngs=None,
            )
        else:
            kw = {"triple": True} if triple else {}
            embs4 = self.backbone.apply(
                self.backbone_params, tables, inputs, state=state,
                train=False, rngs=None, **kw,
            )
            new_state = state
        b = src.shape[0]
        return jax.lax.stop_gradient(embs4[:b]), new_state

    def _build_steps(self):
        def train_step(head_params, opt_state, state, csr, tables, batch,
                       labels, key):
            sample_key, dropout_key = jax.random.split(key)
            src_emb, new_state = self._src_embeddings(
                csr, tables, batch, sample_key, state
            )
            valid = batch[-1]

            def loss_fn(hp):
                logits = self.head.apply(
                    hp, src_emb, train=True, rngs={"dropout": dropout_key}
                )[..., 0]
                bce = optax.sigmoid_binary_cross_entropy(logits, labels)
                return (bce * valid).sum() / jnp.maximum(valid.sum(), 1.0), logits

            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                head_params
            )
            updates, opt_state = self.optim.update(grads, opt_state, head_params)
            head_params = optax.apply_updates(head_params, updates)
            return head_params, opt_state, new_state, loss, jax.nn.sigmoid(logits)

        def eval_step(head_params, state, csr, tables, batch, key):
            src_emb, new_state = self._src_embeddings(csr, tables, batch, key, state)
            logits = self.head.apply(head_params, src_emb, train=False)[..., 0]
            return jax.nn.sigmoid(logits), new_state

        def train_scan(head_params, opt_state, state, csr, tables,
                       stacked, labels, keys):
            """Whole head-training epoch as ONE lax.scan program — the same
            dispatch-fusion as LinkPredictionTrainer.train_epoch_scan (per
            batch host dispatch dominates when the device sits behind a
            network tunnel)."""

            def body(carry, inp):
                hp, os_, st = carry
                batch, lab, key = inp
                hp, os_, st, loss, _ = train_step(
                    hp, os_, st, csr, tables, batch, lab, key
                )
                return (hp, os_, st), loss

            (head_params, opt_state, state), losses = jax.lax.scan(
                body, (head_params, opt_state, state), (stacked, labels, keys)
            )
            return head_params, opt_state, state, losses

        def eval_scan(head_params, state, csr, tables, stacked, keys):
            def body(st, inp):
                batch, key = inp
                p, st = eval_step(head_params, st, csr, tables, batch, key)
                return st, p

            state, probs = jax.lax.scan(body, state, (stacked, keys))
            return probs, state

        # tables as explicit traced args (see LinkPredictionTrainer
        # _forward: closures become remote-compile request constants);
        # public signatures preserved via call-time injection wrappers
        jit_train_step = jax.jit(train_step)
        jit_eval_step = jax.jit(eval_step)
        jit_train_scan = jax.jit(train_scan, donate_argnums=(0, 1, 2))
        jit_eval_scan = jax.jit(eval_scan)
        self.train_scan_fn = (
            lambda head_params, opt_state, state, csr, stacked, labels, keys:
            jit_train_scan(head_params, opt_state, state, csr, self.tables,
                           stacked, labels, keys)
        )
        self.eval_scan_fn = (
            lambda head_params, state, csr, stacked, keys:
            jit_eval_scan(head_params, state, csr, self.tables, stacked, keys)
        )
        self.train_step = (
            lambda head_params, opt_state, state, csr, batch, labels, key:
            jit_train_step(head_params, opt_state, state, csr,
                           self.tables, batch, labels, key)
        )
        self.eval_step = (
            lambda head_params, state, csr, batch, key:
            jit_eval_step(head_params, state, csr, self.tables, batch, key)
        )

    # ----------------------------------------------------------------- loops
    def _batch_arrays(self, b: Batch):
        return (
            jnp.asarray(b.src, jnp.int32),
            jnp.asarray(b.dst, jnp.int32),
            jnp.asarray(time_keys(b.ts), jnp.int32),
            jnp.asarray(b.eid, jnp.int32),
            jnp.asarray(b.valid, jnp.float32),
        )

    def init_params(self, seed: int):
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            key = jax.random.PRNGKey(seed)
            head_params = self.head.init(
                key, jnp.zeros((1, self.tables.node_dim))
            )
            opt_state = self.optim.init(head_params)
        return jax.device_put((head_params, opt_state), jax.local_devices()[0])

    def init_state(self):
        return self.backbone.init_state(self.tables) if self.has_state else None

    def _stacked_batches(self, stream: EdgeStream, key):
        """(stacked batch arrays, stacked labels, keys, valid counts)."""
        batches = list(chronological_batches(stream, self.cfg.batch_size))
        assert all(
            len(b.src) == self.cfg.batch_size for b in batches
        ), "scan path needs uniform (padded) batches; got a ragged batch"
        arrays = [self._batch_arrays(b) for b in batches]
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *arrays
        )
        labels = jnp.stack(
            [jnp.asarray(b.label, jnp.float32) for b in batches]
        )
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(len(batches))
        )
        return batches, stacked, labels, keys

    def evaluate(self, head_params, stream: EdgeStream, state=None, salt=0):
        """Global-AUC sweep (evaluate_models_utils.py:157-242)."""
        probs, labels = [], []
        key = jax.random.PRNGKey(999 + salt)
        if self.cfg.scan_epochs:
            batches, stacked, _, keys = self._stacked_batches(stream, key)
            p_all, state = self.eval_scan_fn(
                head_params, state, self.full_csr, stacked, keys
            )
            p_all = np.asarray(p_all)
            for i, b in enumerate(batches):
                n = b.num_valid
                probs.append(p_all[i][:n])
                labels.append(b.label[:n])
        else:
            for i, b in enumerate(
                chronological_batches(stream, self.cfg.batch_size)
            ):
                p, state = self.eval_step(
                    head_params, state, self.full_csr,
                    self._batch_arrays(b), jax.random.fold_in(key, i),
                )
                n = b.num_valid
                probs.append(np.asarray(p)[:n])
                labels.append(b.label[:n])
        metrics = node_classification_metrics(
            np.concatenate(probs), np.concatenate(labels)
        )
        return metrics, state

    def fit(self, seed: int = 0, log=print) -> dict:
        head_params, opt_state = self.init_params(seed)
        # parameter-size report (train_node_classification.py logs the same
        # count*4-bytes accounting as the link-pred driver :130-131)
        n_params = sum(
            int(np.prod(p.shape))
            for tree in (self.backbone_params, head_params)
            for p in jax.tree_util.tree_leaves(tree)
        )
        log(
            f"model name: {type(self.backbone).__name__}+MLPClassifier, "
            f"#parameters: {n_params * 4} B, {n_params * 4 / 1024:.4f} KB, "
            f"{n_params * 4 / 1024 / 1024:.4f} MB."
        )
        root_key = jax.random.PRNGKey(seed)
        early = EarlyStopping(self.cfg.patience, self.save_path)

        for epoch in range(self.cfg.num_epochs):
            t0 = time.time()
            state = self.init_state()
            if self.cfg.scan_epochs:
                _, stacked, labels, keys = self._stacked_batches(
                    self.data.train, jax.random.fold_in(root_key, epoch)
                )
                head_params, opt_state, state, loss_arr = self.train_scan_fn(
                    head_params, opt_state, state, self.full_csr,
                    stacked, labels, keys,
                )
                losses = list(np.asarray(loss_arr))
            else:
                losses = []
                for i, b in enumerate(
                    chronological_batches(self.data.train, self.cfg.batch_size)
                ):
                    key = jax.random.fold_in(
                        jax.random.fold_in(root_key, epoch), i
                    )
                    head_params, opt_state, state, loss, _ = self.train_step(
                        head_params, opt_state, state, self.full_csr,
                        self._batch_arrays(b),
                        jnp.asarray(b.label, jnp.float32), key,
                    )
                    losses.append(float(loss))
            val_metrics, val_state = self.evaluate(
                head_params, self.data.val, state=state, salt=0
            )
            log(
                f"epoch {epoch + 1}: train loss {np.mean(losses):.4f} "
                f"val auc {val_metrics['roc_auc']:.4f} ({time.time() - t0:.1f}s)"
            )
            if early.step(val_metrics, head_params, val_state):
                log(f"early stop at epoch {epoch + 1}")
                break

        best = early.load_best()
        head_params = jax.device_put(best["params"])
        val_state = (
            jax.device_put(best["state"]) if best["state"] is not None else None
        )
        test_metrics, _ = self.evaluate(
            head_params, self.data.test, state=val_state, salt=1
        )
        return {
            "validate metrics": dict(early.best),
            "test metrics": test_metrics,
            "head_params": head_params,
        }
