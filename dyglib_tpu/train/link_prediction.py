"""Dynamic link prediction: training + evaluation loops.

Behavioral parity target: train_link_prediction.py:28-501 and
evaluate_models_utils.py:19-154 of the reference.

Choreography preserved:
  * chronological batches, shuffle never (train_link_prediction.py:57-61);
  * train negatives: only destinations resampled, neg_src = src
    (train_link_prediction.py:164-166); eval negatives under the default
    random strategy likewise score (src, neg_dst) — the sampler's neg_src
    draw is discarded (evaluate_models_utils.py:61-63); historical/
    inductive strategies use the sampled (neg_src, neg_dst) pair with the
    batch time-range plumbed through (evaluate_models_utils.py:55-60);
  * loss = mean BCE over [positives || negatives]
    (train_link_prediction.py:243-249) — computed on logits here, same math;
  * metrics per batch, averaged across batches (train:302-309);
  * early stopping when ALL val metrics stop improving (train:349-355);
  * train graph for training, full graph for evaluation (train:148-150);
  * eval negative samplers reset to their seed before each sweep
    (evaluate_models_utils.py:36-37);
  * memory models: memory re-initialized each epoch (train:152-154);
    backup/reload staging train -> val -> new-node-val -> test ->
    new-node-test (train:265-299, 323-340) expressed as functional state
    values handed between sweeps; eval commits positive edges; the best
    checkpoint stores params + post-val memory state (EarlyStopping.py:65-74
    + the *_nonparametric_data payload); no final val re-eval for memory
    models (train:363-366).

TPU-native deviations: the whole step (neighbor sampling + forward + loss +
backward + state commit + update) is one jitted program on static shapes;
positives and negatives are embedded in one 4B-row forward (they share the
same pre-commit memory view, train:186-207); padded tail rows are masked
out of loss, metrics, and state transitions.
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.batching import Batch, chronological_batches
from ..data.containers import EdgeStream
from ..data.datasets import LinkPredictionData
from ..graph.csr import build_temporal_csr, time_keys
from ..graph.neg_sampler import NegativeEdgeSampler
from ..models.base import FeatureTables
from ..nn.modules import MergeLayer
from .checkpoints import load_checkpoint, save_checkpoint
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
    head_dropout: float = 0.1  # MLPClassifier dropout (node classification)
    resume_every_batches: int = 0  # >0: write a mid-epoch resume checkpoint
    scan_epochs: bool = False  # fuse each train epoch into one lax.scan program
    profile_dir: str = ""  # non-empty: jax.profiler trace of epoch 2
    # per-batch sequence-length bucketing for backbones that support it
    # (DyGFormer): pick the smallest static bucket covering the batch's
    # longest history instead of always padding to max_input_sequence_length
    # — the TPU-native analogue of the reference's per-batch dynamic padding
    # (DyGFormer.py:219-226). One jit specialization per bucket.
    sequence_buckets: bool = True
    checkpoint_backend: str = "pickle"  # or "orbax" (directory checkpoints)
    tensorboard_dir: str = ""  # non-empty: scalar event stream per epoch
    # validation mode: after every train step (per epoch in scan mode),
    # verify no node's memory clock moved backwards — the sharded-state
    # temporal-ordering guard (SURVEY §5 race detection; reference asserts
    # at MemoryModel.py:448-449). Costs a device->host state read per
    # check, so off by default.
    check_memory_order: bool = False
    # live per-batch progress line on stderr (the reference's tqdm bar with
    # running loss, train_link_prediction.py:158; cosmetic, off by default —
    # unavailable in scan mode where the epoch is one fused program)
    show_progress: bool = False


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam / SGD / RMSprop, matching create_optimizer (utils/utils.py:50-68).

    torch.optim.Adam's weight_decay is COUPLED L2-into-gradient (added to the
    gradient BEFORE the moment updates), not AdamW's decoupled decay — so the
    decay transform must run before scale_by_adam, not after
    (tests/test_aux_subsystems.py::test_coupled_weight_decay_matches_torch).
    """
    if cfg.optimizer == "adam":
        if cfg.weight_decay:
            return optax.chain(
                optax.add_decayed_weights(cfg.weight_decay),
                optax.scale_by_adam(),
                optax.scale(-cfg.learning_rate),
            )
        return optax.adam(cfg.learning_rate)
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
        mesh=None,
    ):
        """``mesh``: optional jax.sharding.Mesh. When given, every training/
        eval step runs SPMD over it: batches sharded over the ``data`` axis,
        params/optimizer replicated, feature tables sharded over the
        ``model`` axis, and memory-model state sharded over nodes (the
        ``data`` axis) — XLA inserts the ICI collectives. The reference has
        no distributed execution at all (SURVEY §2.6); this is the TPU-native
        scale-out path validated on virtual device meshes.
        """
        self.backbone = backbone
        self.data = data
        self.cfg = cfg
        self.save_path = save_path
        self.mesh = mesh
        self.resume_every = cfg.resume_every_batches
        self.has_state = getattr(backbone, "has_state", False)

        self.tables = FeatureTables(
            node=jnp.asarray(data.node_raw_features),
            edge=jnp.asarray(data.edge_raw_features),
        )
        if mesh is not None:
            from ..parallel.mesh import batch_sharded, feature_sharded, replicated

            self._repl = replicated(mesh)
            self._bsh = batch_sharded(mesh)
            self._fsh = feature_sharded(mesh)
            self.tables = FeatureTables(
                node=jax.device_put(self.tables.node, self._fsh),
                edge=jax.device_put(self.tables.edge, self._fsh),
            )
        with_tia = (
            getattr(backbone, "sample_strategy", "recent") == "time_interval_aware"
        )
        # per-segment feature prefix sums on the CSR, for backbones whose
        # node encoder is a windowed feature mean (GraphMixer): O(1)-per-query
        # aggregation instead of a (B, time_gap, Dn) gather. Auto-disabled
        # above the HBM budget (the table is (2E, Dn) float32).
        fpx = None
        if getattr(backbone, "wants_feat_prefix", False):
            table_bytes = (
                2 * data.full.num_interactions * data.node_raw_features.shape[1] * 4
            )
            if table_bytes <= 2_000_000_000:
                fpx = data.node_raw_features
        # entry-ordered packed feature table for contiguous window fetches
        # (csr.feat_entry): only useful for the 'recent' strategy and only
        # affordable under a byte budget — (Dn+De)*4 B per CSR entry
        fex = None
        fe_pad = 512
        if (
            getattr(backbone, "wants_entry_features", False)
            and getattr(backbone, "sample_strategy", "recent") == "recent"
        ):
            entry_bytes = (
                2 * data.full.num_interactions
                * (data.node_raw_features.shape[1] + data.edge_raw_features.shape[1])
                * 4
            )
            if entry_bytes <= 2_000_000_000:
                fex = (data.node_raw_features, data.edge_raw_features)
                # guard rows must cover the largest window the backbone
                # fetches (DyGFormer maxlen reaches 2048 at CanParl)
                fe_pad = max(
                    fe_pad, int(getattr(backbone, "entry_window_rows", 0))
                )
        fe_layout = getattr(backbone, "entry_feature_layout", "packed")
        self.train_csr = build_temporal_csr(
            data.train, num_nodes=data.num_nodes,
            time_scaling_factor=cfg.time_scaling_factor, with_tia=with_tia,
            feat_prefix_of=fpx, feat_entry_of=fex, feat_entry_pad=fe_pad,
            feat_entry_layout=fe_layout,
        )
        self.full_csr = build_temporal_csr(
            data.full, num_nodes=data.num_nodes,
            time_scaling_factor=cfg.time_scaling_factor, with_tia=with_tia,
            feat_prefix_of=fpx, feat_entry_of=fex, feat_entry_pad=fe_pad,
            feat_entry_layout=fe_layout,
        )
        # pre-placement CSR reference for init_params: under multi-host the
        # mesh-placed CSR is a global (non-addressable) array that cannot be
        # device_put back to one local CPU device
        self._local_train_csr = self.train_csr
        if mesh is not None:  # adjacency replicated on every device
            self.train_csr = jax.device_put(self.train_csr, self._repl)
            self.full_csr = jax.device_put(self.full_csr, self._repl)

        self.head = MergeLayer(hidden_dim=self.tables.node_dim, output_dim=1)

        # negative samplers with the reference's seed layout (train unseeded;
        # val/nn-val/test/nn-test = 0/1/2/3, train_link_prediction.py:49-54)
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
        # sequence-length buckets (DyGFormer): active when the backbone
        # publishes candidates and there is more than one
        self._buckets: tuple[int, ...] | None = None
        if cfg.sequence_buckets:
            cands = getattr(backbone, "bucket_candidates", None)
            if cands and len(cands) > 1:
                self._buckets = tuple(cands)
        self._host_hist: dict[int, tuple[np.ndarray, np.ndarray, int]] = {}

        self.optim = make_optimizer(cfg)
        self._build_steps()

    # ---------------------------------------------------------------- jitted
    def _forward(self, params, csr, tables, batch, key, train, state, commit,
                 bucket=None, dedup_eval=False):
        """Quad forward (+ optional state commit) -> loss, probs, new_state.

        ``tables`` is an explicit traced argument, never a closure: feature
        tables closed over a jitted function become captured lowering
        constants, which this platform ships inside the remote-compile
        request — at the 10M-edge scale that is a 7.6 GB HTTP body (the
        compile service rejects >~300 MB).

        Training embeds only the TRIPLE [src, dst, neg_dst] for
        pair-independent backbones and reuses the src embedding for neg_src:
        the reference trains with neg_src = src
        (train_link_prediction.py:165-166), so the 4th quad column is an
        identical recomputation — dropping it cuts sampling, gathers, and
        FLOPs by 25%. Pair-aware backbones (TCL, CAWN, DyGFormer embed a
        node differently per partner) and evaluation (neg_src independently
        drawn) keep the full quad.
        """
        src, dst, neg_src, neg_dst, ts, eid, valid = batch
        b = src.shape[0]
        # dedup_eval (round 4): under the SHIPPED random-strategy eval
        # protocol neg_src = src (evaluate_models_utils.py:61-63), so the
        # training-side triple dedup applies to evaluation too — the
        # caller sets it only when the sampler strategy is 'random'.
        dedup = (train or dedup_eval) and getattr(
            self.backbone, "pair_independent", False
        )
        # pair-AWARE backbones with deterministic sampling (DyGFormer, TCL)
        # also train on the triple: the net reuses src's per-row channels
        # for both pairs and returns quad-order embeddings (triple=True —
        # exact under the reference's neg_src = src contract)
        # triple exactness requires (a) stateless backbone (a stateful one
        # would feed a 3B-row triple into embed_quad's state commit) and
        # (b) deterministic 'recent' sampling (neg_src rows bit-identical
        # to src presupposes identical neighbor draws)
        triple_aware = (
            (train or dedup_eval) and not dedup and not self.has_state
            and getattr(self.backbone, "triple_expand", False)
            and getattr(self.backbone, "sample_strategy", "recent") == "recent"
        )
        if dedup or triple_aware:
            ids = jnp.concatenate([src, dst, neg_dst])
            tsx = jnp.tile(ts, 3)
        else:
            ids = jnp.concatenate([src, dst, neg_src, neg_dst])
            tsx = jnp.tile(ts, 4)
        sample_key, dropout_key = jax.random.split(key)
        if bucket is None:
            inputs = self.backbone.sample(csr, ids, tsx, sample_key)
        else:
            inputs = self.backbone.sample(csr, ids, tsx, sample_key, seq_len=bucket)
        if self.has_state:
            # explicit per-row roles: JODIE's time-shift normalization is
            # per role and must track the actual layout (quad vs dedup
            # triple), never be inferred from the row count
            from ..models.memory_model import segment_roles

            layout = ("src", "dst", "dst") if dedup else ("src", "dst", "src", "dst")
            inputs = inputs._replace(roles=segment_roles(b, layout))
        rngs = {"dropout": dropout_key} if train else None

        if self.has_state:
            embs, raw4 = self.backbone.embed_quad(
                params["backbone"], tables, state, inputs,
                train=train, rngs=rngs,
            )
            if commit:
                new_state = self.backbone.commit(
                    params["backbone"], tables, state,
                    src, dst, ts, eid, valid,
                    raw4[:b], raw4[b : 2 * b],
                )
            else:
                new_state = state
        else:
            kw = {"triple": True} if triple_aware else {}
            embs = self.backbone.apply(
                params["backbone"], tables, inputs,
                state=state, train=train, rngs=rngs, **kw,
            )
            raw4 = embs
            new_state = state
        if dedup:  # [s, d, nd] -> [s, d, s, nd]
            embs4 = jnp.concatenate([embs[: 2 * b], embs[:b], embs[2 * b :]])
        else:
            embs4 = embs  # triple_aware nets already return quad order
        s_e, d_e, ns_e, nd_e = jnp.split(embs4, 4, axis=0)

        pos_logit = self.head.apply(params["head"], s_e, d_e)[..., 0]
        neg_logit = self.head.apply(params["head"], ns_e, nd_e)[..., 0]
        bce_pos = optax.sigmoid_binary_cross_entropy(
            pos_logit, jnp.ones_like(pos_logit)
        )
        bce_neg = optax.sigmoid_binary_cross_entropy(
            neg_logit, jnp.zeros_like(neg_logit)
        )
        denom = jnp.maximum(2.0 * valid.sum(), 1.0)
        loss = ((bce_pos + bce_neg) * valid).sum() / denom
        probs = (jax.nn.sigmoid(pos_logit), jax.nn.sigmoid(neg_logit))
        return loss, probs, new_state, raw4

    def _build_steps(self):
        def train_step(params, opt_state, state, csr, tables, batch, key,
                       bucket=None):
            def loss_fn(p):
                loss, probs, _, raw4 = self._forward(
                    p, csr, tables, batch, key, True, state, False, bucket
                )
                return loss, (probs, raw4)

            (loss, (probs, raw4)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            # memory commit runs OUTSIDE autodiff (the linearized scatter
            # chain miscompiles under the SPMD partitioner with node-sharded
            # state; commit is gradient-free by reference semantics — see
            # memory_model.commit). It uses the PRE-update params, matching
            # the reference order: memory committed during forward, before
            # optimizer.step (train_link_prediction.py:186-207, 255-257).
            if self.has_state:
                src, dst, _, _, ts, eid, valid = batch
                b = src.shape[0]
                new_state = self.backbone.commit(
                    params["backbone"], tables, state,
                    src, dst, ts, eid, valid, raw4[:b], raw4[b : 2 * b],
                )
            else:
                new_state = state
            updates, opt_state = self.optim.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, new_state, loss, probs

        def eval_step(params, state, csr, tables, batch, key, bucket=None,
                      dedup_eval=False):
            loss, probs, new_state, _ = self._forward(
                params, csr, tables, batch, key, False, state, True, bucket,
                dedup_eval=dedup_eval,
            )
            return loss, probs, new_state

        def eval_scan(params, state, csr, tables, stacked_batches, keys,
                      dedup_eval=False):
            """Whole evaluation sweep as one lax.scan program — removes the
            per-batch host dispatch (the dominant eval cost when the device
            is reached through a network tunnel). State (memory models)
            threads through the scan exactly like the per-batch loop."""

            def body(state, inp):
                batch, key = inp
                loss, probs, state = eval_step(
                    params, state, csr, tables, batch, key,
                    dedup_eval=dedup_eval,
                )
                return state, (loss, probs)

            state, (losses, probs) = jax.lax.scan(
                body, state, (stacked_batches, keys)
            )
            return losses, probs, state

        def train_epoch_scan(params, opt_state, state, csr, tables,
                             stacked_batches, keys):
            """Whole epoch as one lax.scan — removes per-batch host dispatch
            (valuable when the dispatch path, not the chip, is the
            bottleneck). Semantics identical to the per-batch loop given
            the same negative samples; per-batch probs are returned for
            host-side metric computation."""

            def body(carry, inp):
                params, opt_state, state = carry
                batch, key = inp
                params, opt_state, state, loss, probs = train_step(
                    params, opt_state, state, csr, tables, batch, key
                )
                return (params, opt_state, state), (loss, probs)

            (params, opt_state, state), (losses, probs) = jax.lax.scan(
                body, (params, opt_state, state), (stacked_batches, keys)
            )
            return params, opt_state, state, losses, probs

        # params/opt_state/memory-state buffers are donated: every caller
        # rebinds them to the step's outputs, and XLA can update Adam moments
        # and the node-memory table in place instead of allocating fresh HBM
        # each step. eval_step does NOT donate state — the train-state backup
        # is reused across the val and new-node-val sweeps (train:276-287).
        #
        # Feature tables are threaded as an explicit traced argument (see
        # _forward docstring); the public step attributes keep their
        # historical signatures via wrappers that inject self.tables at
        # CALL time — so re-placing the tables (mesh sharding, graft
        # dryrun) needs no rebuild.
        jit_train_step = jax.jit(
            train_step, donate_argnums=(0, 1, 2), static_argnums=(7,)
        )
        jit_eval_step = jax.jit(eval_step, static_argnums=(6, 7))
        jit_eval_scan = jax.jit(eval_scan, static_argnums=(6,))
        jit_train_epoch_scan = jax.jit(
            train_epoch_scan, donate_argnums=(0, 1, 2)
        )
        self.train_step = (
            lambda params, opt_state, state, csr, batch, key, bucket=None:
            jit_train_step(
                params, opt_state, state, csr, self.tables, batch, key, bucket
            )
        )
        self.eval_step = (
            lambda params, state, csr, batch, key, bucket=None,
            dedup_eval=False:
            jit_eval_step(params, state, csr, self.tables, batch, key,
                          bucket, dedup_eval)
        )
        self.eval_scan_fn = (
            lambda params, state, csr, stacked_batches, keys,
            dedup_eval=False:
            jit_eval_scan(params, state, csr, self.tables, stacked_batches,
                          keys, dedup_eval)
        )
        self.train_epoch_scan_fn = (
            lambda params, opt_state, state, csr, stacked_batches, keys:
            jit_train_epoch_scan(
                params, opt_state, state, csr, self.tables,
                stacked_batches, keys,
            )
        )
        # raw jit objects for .lower()/cost-analysis consumers (bench.py);
        # callers pass tables explicitly
        self.train_epoch_scan_jit = jit_train_epoch_scan
        self.train_step_jit = jit_train_step

    # ----------------------------------------------------------------- setup
    def init_params(self, seed: int):
        # initialize on the CPU backend: flax init runs EAGERLY, and on a
        # remote-compiled TPU platform each tiny eager op would otherwise
        # pay a full compile round-trip (minutes of wall clock for fresh
        # shapes); params transfer to the default device afterwards
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            key = jax.random.PRNGKey(seed)
            k_backbone, k_head = jax.random.split(key)
            # build CPU copies from HOST data, not the placed arrays: under
            # multi-host the mesh-placed tables/CSR are global arrays that
            # are not fully addressable from one process
            cpu_tables = FeatureTables(
                node=jnp.asarray(self.data.node_raw_features),
                edge=jnp.asarray(self.data.edge_raw_features),
            )
            cpu_csr = jax.device_put(self._local_train_csr, cpu)
            params = {
                "backbone": self.backbone.init(k_backbone, cpu_tables, cpu_csr),
                "head": self.head.init(
                    k_head,
                    jnp.zeros((1, self.tables.node_dim)),
                    jnp.zeros((1, self.tables.node_dim)),
                ),
            }
            opt_state = self.optim.init(params)
        if self.mesh is not None:
            return jax.device_put((params, opt_state), self._repl)
        return jax.device_put((params, opt_state), jax.local_devices()[0])

    def init_state(self):
        state = self.backbone.init_state(self.tables) if self.has_state else None
        return self._place_state(state)

    def _place_state(self, state):
        if state is None or self.mesh is None:
            return state
        # memory/message tables sharded over node id: gathers of neighbor
        # memories and the keep-last commit scatter become XLA collectives
        # over ICI (SURVEY §2.6 TPU-equivalents)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        return jax.device_put(state, NamedSharding(self.mesh, P(DATA_AXIS)))

    # --------------------------------------------- memory-order validation
    def _order_snapshot(self, state):
        """Host copy of the memory clocks, taken BEFORE a (donating) step.

        Only under cfg.check_memory_order (costs a device->host read)."""
        if state is None or not self.cfg.check_memory_order:
            return None
        return (np.asarray(state.last_update), np.asarray(state.msg_time))

    def _check_order(self, snap, new_state, where: str) -> None:
        if snap is None:
            return
        from ..models.memory_model import memory_order_violations

        n = memory_order_violations(snap[0], snap[1], new_state)
        if n:
            raise RuntimeError(
                f"memory order violated at {where}: {n} node clock(s) moved "
                "backwards — batches applied out of chronological order or "
                "sharded-state corruption (see memory_order_violations)"
            )

    # ------------------------------------------------------------------ loops
    def _batch_arrays(self, b: Batch, neg_src, neg_dst):
        return self._place_batch(
            (
                jnp.asarray(b.src, jnp.int32),
                jnp.asarray(b.dst, jnp.int32),
                jnp.asarray(neg_src, jnp.int32),
                jnp.asarray(neg_dst, jnp.int32),
                jnp.asarray(time_keys(b.ts), jnp.int32),
                jnp.asarray(b.eid, jnp.int32),
                jnp.asarray(b.valid, jnp.float32),
            )
        )

    def _place_batch(self, arrays, spec_rank: int = 0):
        """Shard a (global) batch tuple over the mesh's data axis.

        Single process: a resharding device_put. Multi-host: every process
        holds the same global batch (the edge stream is replicated host
        state) and materializes only its addressable shards via
        make_array_from_callback — the per-host data-loading path that keeps
        GLOBAL chronological batch boundaries (parallel/distributed.py).
        ``spec_rank``: index of the axis to shard (1 for scan-stacked
        (T, B, ...) arrays).
        """
        if self.mesh is None:
            return arrays
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        spec = P(*([None] * spec_rank + [DATA_AXIS]))
        sh = NamedSharding(self.mesh, spec)
        if jax.process_count() > 1:
            return tuple(
                jax.make_array_from_callback(
                    a.shape, sh, lambda idx, a=np.asarray(a): a[idx]
                )
                for a in arrays
            )
        return jax.device_put(arrays, sh)

    def _gather_for_save(self, tree):
        """Node-sharded state is not host-addressable under multi-host;
        allgather it before checkpoint serialization (no-op otherwise)."""
        if tree is not None and self.mesh is not None and jax.process_count() > 1:
            from jax.experimental import multihost_utils

            return multihost_utils.process_allgather(tree, tiled=True)
        return tree

    def _place_repl(self, x):
        """Replicate a host/default-device value over the mesh (no-op without)."""
        if self.mesh is None:
            return x
        return jax.device_put(x, self._repl)

    def _host_probs(self, probs):
        """Batch probabilities as host numpy (allgather under multi-host)."""
        if (
            isinstance(probs[0], jax.Array)
            and not probs[0].is_fully_addressable
        ):
            from jax.experimental import multihost_utils

            probs = multihost_utils.process_allgather(probs, tiled=True)
        return np.asarray(probs[0]), np.asarray(probs[1])

    def _pad_negs(self, neg: np.ndarray, b: Batch) -> np.ndarray:
        out = np.zeros(len(b.src), dtype=np.int64)
        out[: len(neg)] = neg
        if len(neg) < len(out):
            out[len(neg):] = neg[-1] if len(neg) else 0
        return out

    def _pick_bucket(self, csr, b: Batch, neg_src, neg_dst) -> int | None:
        """Smallest static sequence bucket covering this batch's histories.

        Host-side equivalent of the reference's per-batch dynamic padding
        (DyGFormer.py:219-226): the longest strictly-before history over all
        4B query nodes, +1 for the prepended target, rounded up to the next
        bucket. Returns None when bucketing is off or the full length is
        needed (None == the default maxlen specialization).
        """
        if not self._buckets:
            return None
        key = id(csr)
        if key not in self._host_hist:
            # composite (node, time) keys: CSR entries are grouped by node id
            # (ascending) and time-sorted within each segment, so
            # node * base + ts is GLOBALLY sorted and one batched
            # searchsorted answers all 4B strictly-before counts at once
            offsets = np.asarray(csr.offsets, dtype=np.int64)
            tsarr = np.asarray(csr.ts, dtype=np.int64)
            base = int(tsarr.max()) + 2 if tsarr.size else 2
            node_of = np.repeat(
                np.arange(len(offsets) - 1, dtype=np.int64), np.diff(offsets)
            )
            self._host_hist[key] = (offsets, node_of * base + tsarr, base)
        offsets, comp, base = self._host_hist[key]
        tk = np.asarray(time_keys(b.ts), dtype=np.int64)
        ids = np.concatenate(
            [np.asarray(x, dtype=np.int64) for x in (b.src, b.dst, neg_src, neg_dst)]
        )
        # clamp query times into the key range: any t beyond the stored max
        # selects the whole segment either way
        qt = np.minimum(np.tile(tk, 4), base - 1)
        counts = np.searchsorted(comp, ids * base + qt, side="left") - offsets[ids]
        mx = int(counts.max()) if counts.size else 0
        cap = self._buckets[-1] - 1  # counts beyond maxlen-1 are truncated
        if mx >= cap:
            return None
        needed = 1 + mx
        bucket = next(c for c in self._buckets if c >= needed)
        return None if bucket == self._buckets[-1] else bucket

    def _batch_metrics(self, probs, batch: Batch):
        n = batch.num_valid
        pos, neg = self._host_probs(probs)
        pos, neg = pos[:n], neg[:n]
        predicts = np.concatenate([pos, neg])
        labels = np.concatenate([np.ones(n), np.zeros(n)])
        return link_prediction_metrics(predicts, labels)

    def train_epoch(
        self, params, opt_state, state, epoch: int, root_key, start_batch: int = 0
    ):
        losses, metrics = [], []
        for i, b in enumerate(
            chronological_batches(self.data.train, self.cfg.batch_size)
        ):
            _, neg_dst = self.train_neg.sample(b.num_valid)
            if i < start_batch:  # resumed mid-epoch; keep the RNG advancing
                continue
            neg_dst = self._pad_negs(neg_dst, b)
            arrays = self._batch_arrays(b, b.src, neg_dst)
            key = self._place_repl(
                jax.random.fold_in(jax.random.fold_in(root_key, epoch), i)
            )
            bucket = self._pick_bucket(self.train_csr, b, b.src, neg_dst)
            order_snap = self._order_snapshot(state)
            params, opt_state, state, loss, probs = self.train_step(
                params, opt_state, state, self.train_csr, arrays, key, bucket
            )
            self._check_order(order_snap, state, f"epoch {epoch} batch {i}")
            losses.append(float(loss))
            metrics.append(self._batch_metrics(probs, b))
            if self.cfg.show_progress:
                print(
                    f"\rEpoch: {epoch + 1}, train for the {i + 1}-th batch, "
                    f"train loss: {losses[-1]:.4f}",
                    end="", file=sys.stderr, flush=True,
                )
            if (
                self.resume_every
                and (i + 1) % self.resume_every == 0
            ):
                save_checkpoint(
                    self.save_path + ".resume", params, state,
                    extra={
                        "epoch": epoch,
                        "next_batch": i + 1,
                        "opt_state": jax.tree_util.tree_map(
                            np.asarray, opt_state
                        ),
                        "early_best": dict(self._early.best)
                        if self._early else {},
                        "early_counter": self._early.counter
                        if self._early else 0,
                    },
                )
        if self.cfg.show_progress and losses:
            print(file=sys.stderr)  # finish the \r progress line
        return params, opt_state, state, losses, metrics

    def train_epoch_scanned(self, params, opt_state, state, epoch: int, root_key):
        """Scan-mode epoch: pre-stage all batches + negatives on host, run
        one fused program, compute metrics from the stacked outputs.

        Equivalent to train_epoch (same step function, same chronology);
        mid-epoch resume checkpoints are not written in this mode.
        """
        batches, metas = [], []
        for i, b in enumerate(
            chronological_batches(self.data.train, self.cfg.batch_size)
        ):
            _, neg_dst = self.train_neg.sample(b.num_valid)
            batches.append(self._batch_arrays(b, b.src, self._pad_negs(neg_dst, b)))
            metas.append(b)
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
        # scan-stacked arrays are (T, B, ...): shard the BATCH axis (axis 1)
        stacked = self._place_batch(stacked, spec_rank=1)
        keys = self._place_repl(
            jax.vmap(
                lambda i: jax.random.fold_in(jax.random.fold_in(root_key, epoch), i)
            )(jnp.arange(len(batches)))
        )
        order_snap = self._order_snapshot(state)
        params, opt_state, state, losses, probs = self.train_epoch_scan_fn(
            params, opt_state, state, self.train_csr, stacked, keys
        )
        self._check_order(order_snap, state, f"epoch {epoch} (scan)")
        losses = [float(x) for x in np.asarray(losses)]
        pos, neg = np.asarray(probs[0]), np.asarray(probs[1])
        metrics = [
            self._batch_metrics((pos[i], neg[i]), metas[i])
            for i in range(len(metas))
        ]
        return params, opt_state, state, losses, metrics

    def evaluate(
        self,
        params,
        stream: EdgeStream,
        neg_sampler: NegativeEdgeSampler,
        eval_key_salt: int = 0,
        state=None,
        scanned: bool | None = None,
    ):
        """One sweep over a split (evaluate_models_utils.py:19-154).

        Returns (losses, metrics, final_state); positive edges update
        memory state along the sweep (memory models).

        ``scanned`` fuses the whole sweep into one lax.scan program (no
        per-batch host dispatch); defaults to cfg.scan_epochs unless the
        backbone uses sequence buckets (per-batch static shapes). Batch
        staging, negative draws, keys, metrics, and state threading are
        identical in both modes (tests/test_scan_epoch.py).
        """
        if stream.num_interactions == 0:
            return [], [], state
        if scanned is None:
            scanned = self.cfg.scan_epochs and not self._buckets
        neg_sampler.reset_random_state()
        # under the random strategy neg_src = src (see the staging loop
        # below), so the training-side triple dedup is valid in eval too
        dedup_ok = neg_sampler.negative_sample_strategy == "random"
        key = jax.random.PRNGKey(12345 + eval_key_salt)
        metas, arrays_list, buckets = [], [], []
        for b in chronological_batches(stream, self.cfg.batch_size):
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
                # Reference protocol (evaluate_models_utils.py:61-63): for the
                # random strategy the sampled neg_src is DISCARDED and the
                # negative edge is scored as (src, neg_dst). The draw still
                # happens so seeded sampler streams stay aligned.
                neg_src, neg_dst = neg_sampler.sample(n)
                neg_src = b.src[:n]
            ns, nd = self._pad_negs(neg_src, b), self._pad_negs(neg_dst, b)
            metas.append(b)
            arrays_list.append(self._batch_arrays(b, ns, nd))
            buckets.append(
                None if scanned else self._pick_bucket(self.full_csr, b, ns, nd)
            )

        losses, metrics = [], []
        if scanned:
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *arrays_list
            )
            stacked = self._place_batch(stacked, spec_rank=1)
            keys = self._place_repl(
                jax.vmap(lambda i: jax.random.fold_in(key, i))(
                    jnp.arange(len(metas))
                )
            )
            loss_arr, probs, state = self.eval_scan_fn(
                params, state, self.full_csr, stacked, keys,
                dedup_ok,
            )
            pos, neg = self._host_probs(probs)
            losses = [float(x) for x in np.asarray(loss_arr)]
            metrics = [
                self._batch_metrics((pos[i], neg[i]), metas[i])
                for i in range(len(metas))
            ]
        else:
            for i, (b, arrays, bucket) in enumerate(
                zip(metas, arrays_list, buckets)
            ):
                loss, probs, state = self.eval_step(
                    params, state, self.full_csr, arrays,
                    self._place_repl(jax.random.fold_in(key, i)), bucket,
                    dedup_ok,
                )
                losses.append(float(loss))
                metrics.append(self._batch_metrics(probs, b))
        return losses, metrics, state

    @staticmethod
    def mean_metrics(metrics: list[dict]) -> dict[str, float]:
        if not metrics:
            return {}
        return {k: float(np.mean([m[k] for m in metrics])) for k in metrics[0]}

    def fit(self, seed: int = 0, log=print, resume: bool = False) -> dict:
        """Full reference choreography for one run; returns the results dict.

        With ``resume=True`` and an existing ``<save_path>.resume`` file
        (written every ``cfg.resume_every_batches`` train batches), training
        restarts from the recorded epoch/batch with params, optimizer state,
        memory state, and early-stopping progress restored — the
        failure-recovery story the reference lacks (SURVEY §5).
        """
        params, opt_state = self.init_params(seed)
        # parameter-size report (train_link_prediction.py:130-131: count * 4
        # bytes — the reference counts f32 params; ours are f32 too)
        n_params = sum(
            int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params)
        )
        log(
            f"model name: {type(self.backbone).__name__}, "
            f"#parameters: {n_params * 4} B, {n_params * 4 / 1024:.4f} KB, "
            f"{n_params * 4 / 1024 / 1024:.4f} MB."
        )
        root_key = jax.random.PRNGKey(seed)
        early = EarlyStopping(
            self.cfg.patience, self.save_path,
            checkpoint_backend=self.cfg.checkpoint_backend,
        )
        self._early = early
        tb = None
        if self.cfg.tensorboard_dir:
            from ..utils.tensorboard import SummaryWriter

            tb = SummaryWriter(self.cfg.tensorboard_dir)
        last_val_metrics: dict = {}
        last_nn_val_metrics: dict = {}

        start_epoch, start_batch = 0, 0
        resume_state = None
        if resume and os.path.exists(self.save_path + ".resume"):
            ck = load_checkpoint(self.save_path + ".resume")
            params = self._place_repl(jax.device_put(ck["params"]))
            resume_state = (
                self._place_state(jax.device_put(ck["state"]))
                if ck["state"] is not None else None
            )
            opt_state = self._place_repl(jax.device_put(ck["extra"]["opt_state"]))
            start_epoch = ck["extra"]["epoch"]
            start_batch = ck["extra"]["next_batch"]
            early.best = dict(ck["extra"].get("early_best", {}))
            early.counter = ck["extra"].get("early_counter", 0)
            log(f"resuming from epoch {start_epoch + 1}, batch {start_batch}")

        epoch_mean_losses: list = []
        for epoch in range(start_epoch, self.cfg.num_epochs):
            t0 = time.time()
            # optional profiler capture of the second epoch (first is
            # compile-dominated) — SURVEY §5 tracing subsystem
            profiling = bool(self.cfg.profile_dir) and epoch == start_epoch + 1
            if profiling:
                jax.profiler.start_trace(self.cfg.profile_dir)
            # memory models reinitialize memory each epoch (train:152-154)
            if epoch == start_epoch and resume_state is not None:
                state = resume_state
            else:
                state = self.init_state()
            sb = start_batch if epoch == start_epoch else 0
            if self.cfg.scan_epochs and sb == 0 and not self.resume_every:
                params, opt_state, state, tr_losses, tr_metrics = (
                    self.train_epoch_scanned(params, opt_state, state, epoch, root_key)
                )
            else:
                params, opt_state, state, tr_losses, tr_metrics = self.train_epoch(
                    params, opt_state, state, epoch, root_key, start_batch=sb
                )
            train_state = state  # backup after training (train:265-267)
            _, val_metrics, val_state = self.evaluate(
                params, self.data.val, self.val_neg, 0, state=train_state
            )
            # new-node val resumes from the TRAIN backup (train:276-287)
            _, nn_val_metrics, _ = self.evaluate(
                params, self.data.new_node_val, self.nn_val_neg, 1,
                state=train_state,
            )
            if profiling:
                jax.profiler.stop_trace()
                log(f"profiler trace written to {self.cfg.profile_dir}")
            mv = self.mean_metrics(val_metrics)
            last_val_metrics = mv
            last_nn_val_metrics = self.mean_metrics(nn_val_metrics)
            epoch_mean_losses.append(float(np.mean(tr_losses)))
            dt = time.time() - t0
            n_train = len(tr_losses) * self.cfg.batch_size
            log(
                f"epoch {epoch + 1}: train loss {np.mean(tr_losses):.4f} "
                f"ap {self.mean_metrics(tr_metrics).get('average_precision', 0):.4f}"
                f" | val {mv} | nn-val ap "
                f"{last_nn_val_metrics.get('average_precision', 0):.4f} "
                f"({dt:.1f}s, ~{n_train / max(dt, 1e-9):.0f} edges/s incl. eval)"
            )
            if tb is not None:
                tb.add_scalars(
                    {
                        "train/loss": float(np.mean(tr_losses)),
                        "train/average_precision": self.mean_metrics(
                            tr_metrics
                        ).get("average_precision", 0.0),
                        **{f"val/{k}": v for k, v in mv.items()},
                        "new_node_val/average_precision":
                            last_nn_val_metrics.get("average_precision", 0.0),
                        "perf/epoch_seconds": dt,
                        "perf/edges_per_second": n_train / max(dt, 1e-9),
                    },
                    step=epoch + 1,
                )
            if (epoch + 1) % self.cfg.test_interval_epochs == 0:
                _, test_metrics, _ = self.evaluate(
                    params, self.data.test, self.test_neg, 2, state=val_state
                )
                log(f"  test {self.mean_metrics(test_metrics)}")
            # checkpoint stores params + post-val memory (EarlyStopping.py:65-74)
            if early.step(mv, params, self._gather_for_save(val_state)):
                log(f"early stop at epoch {epoch + 1}")
                break

        best = early.load_best()
        params = self._place_repl(jax.device_put(best["params"]))
        val_state = (
            self._place_state(jax.device_put(best["state"]))
            if best["state"] is not None else None
        )

        results: dict = {"train losses": epoch_mean_losses}
        if not self.has_state:
            _, val_metrics, _ = self.evaluate(
                params, self.data.val, self.val_neg, 0
            )
            _, nn_val_metrics, _ = self.evaluate(
                params, self.data.new_node_val, self.nn_val_neg, 1
            )
            results["validate metrics"] = self.mean_metrics(val_metrics)
            results["new node validate metrics"] = self.mean_metrics(nn_val_metrics)
        else:
            # saved memory has seen val edges; reference skips final val
            # re-eval for memory models (train:363-366)
            results["validate metrics"] = last_val_metrics
            results["new node validate metrics"] = last_nn_val_metrics

        _, test_metrics, _ = self.evaluate(
            params, self.data.test, self.test_neg, 2, state=val_state
        )
        _, nn_test_metrics, _ = self.evaluate(
            params, self.data.new_node_test, self.nn_test_neg, 3, state=val_state
        )
        results["test metrics"] = self.mean_metrics(test_metrics)
        results["new node test metrics"] = self.mean_metrics(nn_test_metrics)
        results["params"] = params
        results["state"] = val_state
        return results
