"""Memory models: TGN, DyRep, JODIE over one functional framework.

Behavioral parity target: models/MemoryModel.py:10-698.

State design (TPU-native): the reference's MemoryBank (nn.Parameter memory +
python dict of raw-message lists, MemoryModel.py:304-422) becomes a
functional pytree with ONE message slot per node — valid because message
aggregation keeps only the LAST message per node (MemoryModel.py:287-291),
and stores only ever append messages for nodes whose slots were just
consumed and cleared (MemoryModel.py:142-161). Slot writes use
deterministic last-occurrence masks (position segment-max) instead of
nondeterministic duplicate scatters. A dump row at index N absorbs writes
from padded batch rows.

Semantics preserved:
  * lazy ALL-nodes memory view per batch (get_updated_memories over
    np.array(range(num_nodes)), MemoryModel.py:108) — here a dense
    where(msg_valid, Cell(msg, mem), mem), which equals the reference's
    sparse update result (only nodes with messages change,
    MemoryModel.py:472-481) as one MXU-friendly batched cell;
  * message = [own_mem || partner_mem || Phi(t - last_update_own) ||
    edge_feat] (MemoryModel.py:53-54, 212-251), computed from the COMMITTED
    memory (update_memories runs before compute_new_node_raw_messages,
    MemoryModel.py:142-148);
  * DyRep: messages embed the partner's EMBEDDING not its memory
    (MemoryModel.py:226-229); returned embeddings are the updated memories
    (MemoryModel.py:163-166);
  * JODIE: TimeProjectionEmbedding mem*(1 + Linear(dt_norm)) with train-set
    time-shift normalization (MemoryModel.py:111-124, 519-545, 667-698);
  * TGN/DyRep: GraphAttentionEmbedding = TGAT-style unrolled attention with
    layer-0 features = memory + raw, merged against memory + raw
    (MemoryModel.py:588-664, esp. 609 and 662);
  * updater: TGN -> GRUCell, DyRep/JODIE -> RNNCell (MemoryModel.py:63-66,
    490-515);
  * positives and negatives share the same pre-commit memory view
    (negatives first in the reference, train_link_prediction.py:186-207 —
    equivalent to one batched forward);
  * state returned from the jitted step is detached by construction =
    truncated BPTT at batch boundaries (detach_memory_bank, train:261-263).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..graph.csr import TemporalCSR
from ..graph.sampler import sample_multi_hop
from ..nn.modules import (
    FusedGRUCell,
    FusedRNNCell,
    MergeLayer,
    TemporalMultiHeadAttention,
    TimeEncoder,
    TorchLinear,
)
from .base import FeatureTables


class MemoryState(NamedTuple):
    """Functional memory-bank state; arrays have N+1 rows (row N = dump)."""

    memory: jnp.ndarray  # (N+1, D) float32
    last_update: jnp.ndarray  # (N+1,) int32 time keys
    msg: jnp.ndarray  # (N+1, message_dim) float32 — keep-last slot
    msg_time: jnp.ndarray  # (N+1,) int32
    msg_valid: jnp.ndarray  # (N+1,) bool


class MemoryModelInputs(NamedTuple):
    ids4: jnp.ndarray  # (M,) query ids, e.g. [src || dst || neg_src || neg_dst]
    ts4: jnp.ndarray  # (M,) int32
    hop_ids: tuple  # TGN/DyRep: hop tensors over ids4 (level 0 = ids4)
    hop_eids: tuple
    hop_ts: tuple
    hop_mask: tuple
    # per-row role flags: False = source role, True = destination role.
    # JODIE's time-shift normalization is per ROLE (MemoryModel.py:111-124),
    # and the trainer feeds embed() three different row layouts (quad
    # [s||d||ns||nd], dedup triple [s||d||nd], node-cls pair [s||d]), so the
    # layout must be explicit — inferring it from the row count silently
    # mis-assigns roles for non-quad layouts. None = quad inference,
    # permitted only when the row count is divisible by 4 (init paths).
    roles: jnp.ndarray | None = None


class TimeShiftStats(NamedTuple):
    src_mean: float = 0.0
    src_std: float = 1.0
    dst_mean: float = 0.0
    dst_std: float = 1.0


def compute_src_dst_node_time_shifts(
    src: np.ndarray, dst: np.ndarray, ts: np.ndarray
) -> TimeShiftStats:
    """Mean/std of per-role inter-event gaps (MemoryModel.py:667-698);
    first occurrence measured against time 0.

    Vectorized: a stable argsort groups each node's interactions while
    preserving stream order within the group, so the previous occurrence's
    timestamp is simply the previous element of the sorted array (first
    occurrence diffs against 0). Exact match of the reference's per-edge
    loop at O(E log E) with no Python per-edge work — at 10M edges the
    loop this replaces took minutes of host time at trainer construction.
    """
    shifts = []
    for ids in (src, dst):
        order = np.argsort(ids, kind="stable")
        sorted_ts = ts[order].astype(np.float64)
        prev = np.empty(len(ids))
        prev[0] = 0.0
        prev[1:] = sorted_ts[:-1]
        sorted_ids = ids[order]
        first = np.empty(len(ids), dtype=bool)
        first[0] = True
        first[1:] = sorted_ids[1:] != sorted_ids[:-1]
        prev[first] = 0.0
        s = np.empty(len(ids))
        s[order] = sorted_ts - prev
        shifts.append(s)
    return TimeShiftStats(
        float(np.mean(shifts[0])), float(np.std(shifts[0])),
        float(np.mean(shifts[1])), float(np.std(shifts[1])),
    )


def segment_roles(b: int, layout: tuple[str, ...]) -> jnp.ndarray:
    """Per-row role flags for a batch of B edges laid out as concatenated
    segments, e.g. ``("src", "dst", "dst")`` for the dedup triple
    [src || dst || neg_dst]. True = destination role."""
    flags = [s == "dst" for s in layout]
    for s in layout:
        if s not in ("src", "dst"):
            raise ValueError(f"unknown role {s!r}")
    return jnp.repeat(jnp.asarray(flags, bool), b, total_repeat_length=b * len(flags))


def quad_roles(b: int) -> jnp.ndarray:
    """Roles for the canonical quad layout [src || dst || neg_src || neg_dst]."""
    return segment_roles(b, ("src", "dst", "src", "dst"))


class MemoryModelNet(nn.Module):
    """Parameters + differentiable compute for one memory-model step."""

    model_name: str  # 'TGN' | 'DyRep' | 'JODIE'
    memory_dim: int = 172  # = node_feat_dim (MemoryModel.py:52)
    time_feat_dim: int = 100
    num_layers: int = 1
    num_heads: int = 2
    dropout: float = 0.1
    time_shifts: TimeShiftStats = TimeShiftStats()

    def setup(self):
        self.time_encoder = TimeEncoder(self.time_feat_dim, name="time_encoder")
        # torch-layout fused cells (nn.modules.FusedGRUCell/FusedRNNCell):
        # exact torch parameterization incl. BOTH bias vectors — the GRU's
        # b_hn lives inside the reset-gate product and is NOT mergeable,
        # and torch's effective bias init is the sum of two uniforms.
        # Two fused matmuls also beat flax's six narrow Denses on the
        # memory-ops-bound TGN step.
        if self.model_name == "TGN":
            self.memory_cell = FusedGRUCell(
                features=self.memory_dim, name="memory_cell"
            )
        elif self.model_name in ("DyRep", "JODIE"):
            self.memory_cell = FusedRNNCell(
                features=self.memory_dim, name="memory_cell"
            )
        else:
            raise ValueError(f"unknown memory model {self.model_name!r}")
        if self.model_name == "JODIE":
            self.time_projection = TorchLinear(self.memory_dim, name="time_projection")
            self.embed_dropout = nn.Dropout(self.dropout)
        else:
            self.convs = [
                TemporalMultiHeadAttention(
                    self.num_heads, self.dropout, name=f"temporal_conv_{l}"
                )
                for l in range(self.num_layers)
            ]
            self.merges = [
                MergeLayer(self.memory_dim, self.memory_dim, name=f"merge_{l}")
                for l in range(self.num_layers)
            ]

    def apply_cell(self, msg: jnp.ndarray, mem: jnp.ndarray) -> jnp.ndarray:
        return self.memory_cell(mem, msg)

    def memory_view(self, state: MemoryState) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Lazily-updated (memory, last_update) over ALL nodes
        (get_updated_memories, MemoryModel.py:170-191, 461-487).

        O(N) per call — kept as the parity oracle and for checkpoint
        materialization; the hot path uses :meth:`view_rows`."""
        upd = self.apply_cell(state.msg, state.memory)
        memory = jnp.where(state.msg_valid[:, None], upd, state.memory)
        last_update = jnp.where(state.msg_valid, state.msg_time, state.last_update)
        return memory, last_update

    def view_rows(
        self, state: MemoryState, rows: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Lazily-updated (memory, last_update) for the GATHERED rows only.

        Exact sparse equivalent of ``memory_view(state)[...][rows]``: the
        reference's get_updated_memories over ALL nodes changes only nodes
        with pending messages (MemoryModel.py:472-481), and the cell is
        row-wise, so gather-then-cell == cell-then-gather. This makes the
        per-step cost O(rows gathered) instead of O(N) — the difference
        between pod-scaling and the dense-cell wall at 1M+ nodes."""
        mem = state.memory[rows]
        msg = state.msg[rows]
        valid = state.msg_valid[rows]
        upd = self.apply_cell(msg, mem)
        memory = jnp.where(valid[..., None], upd, mem)
        last_update = jnp.where(valid, state.msg_time[rows], state.last_update[rows])
        return memory, last_update

    def embed(
        self,
        tables: FeatureTables,
        state: MemoryState,
        inputs: MemoryModelInputs,
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        """Embeddings for ids4 from the lazy memory view -> (4B, D).

        Sparse-exact: the lazy view is materialized only for the gathered
        rows (view_rows), never over all N nodes."""
        if self.model_name == "JODIE":
            mem_rows, lu_rows = self.view_rows(state, inputs.ids4)
            dt = inputs.ts4.astype(jnp.float32) - lu_rows.astype(jnp.float32)
            # per-ROLE time-delta normalization (MemoryModel.py:114-118):
            # src-role rows use (src_mean, src_std), dst-role rows
            # (dst_mean, dst_std), per the explicit layout in inputs.roles
            roles = inputs.roles
            if roles is None:
                m = inputs.ids4.shape[0]
                if m % 4 != 0:
                    raise ValueError(
                        "JODIE embed needs explicit inputs.roles for "
                        f"non-quad layouts (got {m} rows)"
                    )
                roles = quad_roles(m // 4)
            mean = jnp.where(
                roles,
                jnp.float32(self.time_shifts.dst_mean),
                jnp.float32(self.time_shifts.src_mean),
            )
            std = jnp.where(
                roles,
                jnp.float32(self.time_shifts.dst_std),
                jnp.float32(self.time_shifts.src_std),
            )
            dt = (dt - mean) / std
            proj = self.time_projection(dt[:, None])
            emb = mem_rows * (1.0 + proj)
            return self.embed_dropout(emb, deterministic=not train)

        # TGN / DyRep: unrolled graph attention, layer-0 = memory + raw
        L = self.num_layers
        flat_ids = [ids.reshape(-1) for ids in inputs.hop_ids]
        flat_ts = [ts.reshape(-1) for ts in inputs.hop_ts]
        base = [
            self.view_rows(state, ids)[0] + tables.node[ids] for ids in flat_ids
        ]
        feats = list(base)
        for l in range(1, L + 1):
            new_feats = []
            for h in range(0, L - l + 1):
                m = flat_ids[h].shape[0]
                kk = flat_ids[h + 1].shape[0] // m
                dt = (flat_ts[h][:, None] - flat_ts[h + 1].reshape(m, kk)).astype(
                    jnp.float32
                )
                phi_dt = self.time_encoder(dt)
                phi_0 = self.time_encoder(jnp.zeros((m, 1), jnp.float32))[:, 0, :]
                edge_feat = tables.edge[inputs.hop_eids[h].reshape(m, kk)]
                mask = inputs.hop_mask[h].reshape(m, kk)
                out, _ = self.convs[l - 1](
                    feats[h], phi_0, feats[h + 1].reshape(m, kk, -1),
                    phi_dt, edge_feat, mask, train=train,
                )
                out = self.merges[l - 1](out, base[h])
                new_feats.append(out)
            feats = new_feats
        return feats[0].reshape(inputs.ids4.shape[0], -1)

    def new_messages(
        self,
        tables: FeatureTables,
        memory: jnp.ndarray,
        last_update: jnp.ndarray,
        own_ids: jnp.ndarray,
        partner_ids: jnp.ndarray,
        partner_emb: jnp.ndarray,
        ts: jnp.ndarray,
        eids: jnp.ndarray,
    ) -> jnp.ndarray:
        """Raw messages for own_ids from the COMMITTED memory
        (MemoryModel.py:212-251)."""
        own_mem = memory[own_ids]
        partner_mem = (
            partner_emb if self.model_name == "DyRep" else memory[partner_ids]
        )
        dt = ts.astype(jnp.float32) - last_update[own_ids].astype(jnp.float32)
        phi = self.time_encoder(dt[:, None])[:, 0, :]
        edge_feat = tables.edge[eids]
        return jnp.concatenate([own_mem, partner_mem, phi, edge_feat], axis=-1)

    def __call__(self, tables, state, inputs, *, train: bool = False):
        """Init entry point — touches every parameterized path."""
        embs = self.embed(tables, state, inputs, train=train)
        b4 = inputs.ids4.shape[0]
        b = b4 // 4
        _ = self.new_messages(
            tables, state.memory, state.last_update,
            inputs.ids4[:b], inputs.ids4[b : 2 * b], embs[b : 2 * b],
            inputs.ts4[:b], jnp.zeros((b,), jnp.int32),
        )
        return embs


def memory_order_violations(
    prev_last_update: np.ndarray,
    prev_msg_time: np.ndarray,
    new_state: "MemoryState",
) -> int:
    """Count of nodes whose memory clock moved BACKWARDS across a state
    transition — the framework's equivalent of the reference's
    "memory to update should not be in the past" asserts
    (MemoryModel.py:448-449, 475-476), recast as a host-side validation so
    the jitted path stays assert-free.

    The chronological stream makes both clocks non-decreasing per node:
    ``last_update`` only advances to committed message times, and the
    keep-last message slot only stores times >= the one it overwrites
    (clearing a slot leaves its time in place). A nonzero count therefore
    indicates a temporal-ordering bug — e.g. batches applied out of order,
    or a partitioner miscompile corrupting node-sharded state under SPMD
    (observed once with the commit scatter inside autodiff; see
    MemoryModel.commit). The dump row (last row) is excluded: it is
    scrubbed to 0 on every commit by design.
    """
    lu = np.asarray(new_state.last_update)[:-1]
    mt = np.asarray(new_state.msg_time)[:-1]
    return int(
        np.sum(lu < np.asarray(prev_last_update)[:-1])
        + np.sum(mt < np.asarray(prev_msg_time)[:-1])
    )


def _last_occurrence_mask(
    safe_ids: jnp.ndarray, valid: jnp.ndarray, n: int
) -> jnp.ndarray:
    """True at the LAST valid position of each id (deterministic keep-last)."""
    pos = jnp.arange(safe_ids.shape[0], dtype=jnp.int32)
    pos_v = jnp.where(valid, pos, -1)
    seg_last = jax.ops.segment_max(pos_v, safe_ids, num_segments=n + 1)
    return valid & (seg_last[safe_ids] == pos_v)


@dataclasses.dataclass
class MemoryModel:
    """Backbone adapter for TGN / DyRep / JODIE."""

    model_name: str = "TGN"
    memory_dim: int = 172
    num_neighbors: int = 10
    num_layers: int = 1
    num_heads: int = 2
    dropout: float = 0.1
    time_feat_dim: int = 100
    sample_strategy: str = "recent"
    time_shifts: TimeShiftStats = TimeShiftStats()
    has_state: bool = True
    # embeddings are row-independent given the shared memory view, so the
    # trainer may reuse the src embedding for neg_src (= src in training)
    pair_independent: bool = True

    def __post_init__(self):
        self.module = MemoryModelNet(
            model_name=self.model_name,
            memory_dim=self.memory_dim,
            time_feat_dim=self.time_feat_dim,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            dropout=self.dropout,
            time_shifts=self.time_shifts,
        )

    def sample(
        self, csr: TemporalCSR, ids: jnp.ndarray, ts: jnp.ndarray, key: jax.Array
    ) -> MemoryModelInputs:
        ids = ids.astype(jnp.int32)
        ts = ts.astype(jnp.int32)
        if self.model_name == "JODIE":
            return MemoryModelInputs(ids, ts, (ids,), (), (ts,), ())
        blocks = sample_multi_hop(
            csr, ids, ts, self.num_neighbors, self.num_layers,
            self.sample_strategy, key,
        )
        b = ids.shape[0]
        return MemoryModelInputs(
            ids4=ids,
            ts4=ts,
            hop_ids=(ids,) + tuple(blk.nbr.reshape(b, -1) for blk in blocks),
            hop_eids=tuple(blk.eid.reshape(b, -1) for blk in blocks),
            hop_ts=(ts,) + tuple(blk.ts.reshape(b, -1) for blk in blocks),
            hop_mask=tuple(blk.mask.reshape(b, -1) for blk in blocks),
        )

    def init_state(self, tables: FeatureTables) -> MemoryState:
        n = tables.node.shape[0]
        d = self.memory_dim
        message_dim = 2 * d + self.time_feat_dim + tables.edge_dim
        # rows padded to a multiple of 8 so the node axis shards evenly on
        # small meshes; commit() uses the LAST row as the dump slot and the
        # extra rows are never addressed
        rows = ((n + 1 + 7) // 8) * 8
        return MemoryState(
            memory=jnp.zeros((rows, d), jnp.float32),
            last_update=jnp.zeros((rows,), jnp.int32),
            msg=jnp.zeros((rows, message_dim), jnp.float32),
            msg_time=jnp.zeros((rows,), jnp.int32),
            msg_valid=jnp.zeros((rows,), bool),
        )

    def init(self, key: jax.Array, tables: FeatureTables, csr: TemporalCSR):
        ids = jnp.zeros((8,), jnp.int32)
        ts = jnp.zeros((8,), jnp.int32)
        inputs = self.sample(csr, ids, ts, jax.random.PRNGKey(0))
        state = self.init_state(tables)
        return self.module.init(key, tables, state, inputs)

    def apply(self, params, tables, inputs, *, state=None, train=False, rngs=None):
        """Embeddings for ids4 against the CURRENT state view (no commit)."""
        return self.module.apply(
            params, tables, state, inputs,
            train=train, rngs=rngs, method=MemoryModelNet.embed,
        )

    def memory_view(self, params, state: MemoryState):
        """Lazily-updated (memory, last_update) over all nodes."""
        return self.module.apply(params, state, method=MemoryModelNet.memory_view)

    def commit(
        self,
        params,
        tables: FeatureTables,
        state: MemoryState,
        src: jnp.ndarray,
        dst: jnp.ndarray,
        ts: jnp.ndarray,
        eids: jnp.ndarray,
        valid: jnp.ndarray,
        src_emb: jnp.ndarray,
        dst_emb: jnp.ndarray,
    ) -> MemoryState:
        """Positive-edge state transition (MemoryModel.py:139-161):
        commit pending messages for src+dst, clear slots, store new
        messages computed from the committed memory."""
        n = state.memory.shape[0] - 1
        src = src.astype(jnp.int32)
        dst = dst.astype(jnp.int32)
        ts = ts.astype(jnp.int32)
        eids = eids.astype(jnp.int32)
        valid = valid.astype(bool)
        ids2 = jnp.concatenate([src, dst])
        valid2 = jnp.concatenate([valid, valid])
        safe2 = jnp.where(valid2, ids2, n)

        # commit pending slots (update_memories, MemoryModel.py:435-459);
        # duplicate ids write identical rows, so the scatter is deterministic
        sel_valid = state.msg_valid[safe2] & valid2
        upd = self.module.apply(
            params, state.msg[safe2], state.memory[safe2],
            method=MemoryModelNet.apply_cell,
        )
        new_mem_rows = jnp.where(sel_valid[:, None], upd, state.memory[safe2])
        new_last_rows = jnp.where(
            sel_valid, state.msg_time[safe2], state.last_update[safe2]
        )
        memory = state.memory.at[safe2].set(new_mem_rows)
        last_update = state.last_update.at[safe2].set(new_last_rows)
        msg_valid = state.msg_valid.at[safe2].set(False)

        # store new messages from the COMMITTED memory, keep-last per node;
        # dst-view messages overwrite src-view for nodes in both roles
        # (reference appends src list then dst list, keep-last wins,
        # MemoryModel.py:148-161 + 287-291)
        msg, msg_time = state.msg, state.msg_time
        for own, partner, partner_emb in (
            (src, dst, dst_emb),
            (dst, src, src_emb),
        ):
            own_safe = jnp.where(valid, own, n)
            new_msgs = self.module.apply(
                params, tables, memory, last_update,
                own_safe, jnp.where(valid, partner, n), partner_emb, ts, eids,
                method=MemoryModelNet.new_messages,
            )
            keep = _last_occurrence_mask(own_safe, valid, n)
            idx = jnp.where(keep, own_safe, n)
            msg = msg.at[idx].set(jnp.where(keep[:, None], new_msgs, msg[idx]))
            msg_time = msg_time.at[idx].set(jnp.where(keep, ts, msg_time[idx]))
            msg_valid = msg_valid.at[idx].set(
                jnp.where(keep, True, msg_valid[idx])
            )

        # scrub the dump row
        memory = memory.at[n].set(0.0)
        last_update = last_update.at[n].set(0)
        msg = msg.at[n].set(0.0)
        msg_time = msg_time.at[n].set(0)
        msg_valid = msg_valid.at[n].set(False)
        # stop_gradient: exact per reference semantics — the loss never
        # consumes commit outputs (it reads the PRE-commit lazy view), and
        # the reference detaches the whole bank at every batch boundary
        # (detach_memory_bank, train_link_prediction.py:261-263), so stored
        # state carries no gradient. This also keeps the scatter chain out
        # of the autodiff transpose, which XLA's SPMD partitioner was
        # observed to miscompile (aux-state corruption) when the state is
        # node-sharded on a mesh; the pure forward scatters partition
        # correctly (tests/test_mesh_training.py).
        return jax.tree_util.tree_map(
            jax.lax.stop_gradient,
            MemoryState(memory, last_update, msg, msg_time, msg_valid),
        )

    def embed_quad(
        self,
        params,
        tables: FeatureTables,
        state: MemoryState,
        inputs: MemoryModelInputs,
        *,
        train: bool = False,
        rngs=None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(output_embs4, raw_embs4).

        raw = the embedding module's outputs (what commit consumes as
        partner embeddings); output applies DyRep's swap — returned
        embeddings are the (pre-commit) updated memories
        (MemoryModel.py:163-166), for the negative pair too.
        """
        raw = self.apply(
            params, tables, inputs, state=state, train=train, rngs=rngs
        )
        out = raw
        if self.model_name == "DyRep":
            out, _ = self.module.apply(
                params, state, inputs.ids4, method=MemoryModelNet.view_rows
            )
        return out, raw

    def forward_and_maybe_commit(
        self,
        params,
        tables: FeatureTables,
        state: MemoryState,
        inputs: MemoryModelInputs,
        src, dst, ts, eids, valid,
        *,
        edges_are_positive: bool = True,
        train: bool = False,
        rngs=None,
    ) -> tuple[jnp.ndarray, MemoryState]:
        """One full step: embed the quad, commit positives, DyRep output swap.

        NOTE for training: do not call this under jax.grad — run
        ``embed_quad`` inside the loss and ``commit`` outside autodiff with
        the raw embeddings (see LinkPredictionTrainer._build_steps). The
        linearized scatter chain of commit was observed to miscompile under
        the SPMD partitioner with node-sharded state; commit is
        gradient-free by reference semantics anyway.
        """
        embs4, raw = self.embed_quad(
            params, tables, state, inputs, train=train, rngs=rngs
        )
        b = src.shape[0]
        new_state = state
        if edges_are_positive:
            new_state = self.commit(
                params, tables, state, src, dst, ts, eids, valid,
                raw[:b], raw[b : 2 * b],
            )
        return embs4, new_state
