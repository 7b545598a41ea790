"""CAWN: causal anonymous walk network.

Behavioral parity target: models/CAWN.py:10-396.

Semantics preserved:
  * multi-hop walk trees sampled with the time_interval_aware strategy;
    tree -> array alignment via repeat so every walk is
    [target, hop1, ..., hopL] with the target's edge id 0
    (CAWN.py:130-164);
  * PositionEncoder: per (pair, node) landing-probability counts — each
    occurrence at hop h of either tree contributes 1/K^h to that node's
    (side, hop) cell; pad node 0 zeroed; features = MLP(counts) summed over
    the src/dst root channels (CAWN.py:197-289). The reference's
    string-keyed dict + np.unique becomes a sorted-key searchsorted join on
    device (occurrence multiplicity = right_insertion - left_insertion);
  * WalkEncoder: [node || time || edge || position] per step -> BiLSTM
    taking the output at each walk's last valid position (packed-sequence
    semantics, CAWN.py:358-396); position features through a second BiLSTM;
    concat, project to attention_dim = ceil(input_dim/2 to num_walk_heads),
    shared post-LN TransformerEncoder over walks, mean-pool, project
    (CAWN.py:292-355).

BiLSTM note: the reference packs each walk to its valid length v and reads
the output at position v-1; for the reversed direction that position is the
FIRST step of the backward pass, so the exact equivalent is a forward
LSTM scan (read h at v-1) plus ONE backward-cell step on input v-1 from the
zero state — no full reverse scan needed.

CAWN is pair-aware through the position encoder: the quad batch is split
into 2B (left, right) pairs for counting, while walk encoding runs on all
4B rows.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph.csr import TemporalCSR
from ..graph.sampler import sample_multi_hop
from ..nn.modules import TimeEncoder, TransformerEncoder
from .base import FeatureTables


class CAWNInputs(NamedTuple):
    walk_ids: jnp.ndarray  # (4B, W, L+1) int32
    walk_eids: jnp.ndarray  # (4B, W, L+1) int32
    walk_ts: jnp.ndarray  # (4B, W, L+1) int32
    query_ts: jnp.ndarray  # (4B,) int32
    hop_ids: tuple  # h = 0..L: (4B, K^h) node ids (occurrence tables)


class BiLSTMEncoder(nn.Module):
    """Packed-sequence BiLSTM read at the last valid position
    (CAWN.py:358-396). hidden_dim is split across the two directions."""

    hidden_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        """(M, T, D), (M,) valid lengths >= 1 -> (M, 2*(hidden_dim//2))."""
        x = x.astype(self.dtype)
        m, t, _ = x.shape
        h1 = self.hidden_dim // 2
        fwd = nn.LSTMCell(features=h1, dtype=self.dtype, name="fwd")
        bwd = nn.LSTMCell(features=h1, dtype=self.dtype, name="bwd")

        carry = fwd.initialize_carry(jax.random.PRNGKey(0), (m, x.shape[-1]))
        outs = []
        for step in range(t):
            carry, y = fwd(carry, x[:, step, :])
            outs.append(y)
        fwd_all = jnp.stack(outs, axis=1)  # (M, T, h1)
        last = jnp.clip(lengths - 1, 0, t - 1)
        h_fwd = jnp.take_along_axis(
            fwd_all, last[:, None, None].astype(jnp.int32), axis=1
        )[:, 0, :]

        # backward direction's output at the last valid position is its
        # first step: one cell application on x[v-1] from the zero state
        x_last = jnp.take_along_axis(
            x, last[:, None, None].astype(jnp.int32), axis=1
        )[:, 0, :]
        carry_b = bwd.initialize_carry(jax.random.PRNGKey(0), (m, x.shape[-1]))
        _, h_bwd = bwd(carry_b, x_last)
        return jnp.concatenate([h_fwd, h_bwd], axis=-1).astype(jnp.float32)


def walk_position_counts(
    walk_ids: jnp.ndarray, hop_ids: tuple, num_nodes: int
) -> jnp.ndarray:
    """Landing-probability counts for every walk entry -> (4B, W, L+1, 2, L+1).

    Cell [..., s, h] = (occurrences of the entry's node at hop h of side s's
    occurrence tree) / K^h — the reference PositionEncoder's dict of
    "{batch_idx}-{node_id}" keys accumulating 1/num_neighbors_at_hop per
    visit over the src- and dst-rooted trees (CAWN.py:197-289).

    Fast path: counts are computed on the HOP TABLES (walk step st is a
    repeat-expansion of hop table st, so per-walk counts are a repeat of
    per-table counts) via a fused equality-compare + reduce — no sort. The
    TPU sort + double searchsorted join this replaces measured 50 ms of
    CAWN's 80 ms step at (B=200, K=32, L=1); the join survives as the
    fallback for walk trees too large to compare blockwise.
    """
    m, w, lp1 = walk_ids.shape
    b = m // 4
    biggest = max(h.shape[1] for h in hop_ids)
    if m * biggest * biggest <= 1 << 28:
        # partner row of each quad row: [src||dst||neg_src||neg_dst] pairs
        # are (q, q+b) for left rows and (q, q-b) for right rows
        ar = jnp.arange(b, dtype=jnp.int32)
        partner = jnp.concatenate([ar + b, ar, ar + 3 * b, ar + 2 * b])
        is_left = jnp.concatenate(
            [jnp.ones(b, bool), jnp.zeros(b, bool)] * 2
        )[:, None]

        per_hop = []  # counts for hop-table entries: (4B, K^st, 2, L+1)
        for st in range(lp1):
            tbl = hop_ids[st]  # (4B, K^st)
            cols = []
            for h in range(lp1):
                occ_self = hop_ids[h]  # (4B, K^h)
                occ_partner = hop_ids[h][partner]
                cnt = lambda occ: (
                    (tbl[:, :, None] == occ[:, None, :]).sum(-1)
                    / occ.shape[1]
                ).astype(jnp.float32)
                c_self, c_part = cnt(occ_self), cnt(occ_partner)
                side0 = jnp.where(is_left, c_self, c_part)  # src-rooted tree
                side1 = jnp.where(is_left, c_part, c_self)  # dst-rooted tree
                cols.append(jnp.stack([side0, side1], axis=-1))  # (4B,K^st,2)
            per_hop.append(jnp.stack(cols, axis=-1))  # (4B, K^st, 2, L+1)

        counts = jnp.stack(
            [
                jnp.repeat(per_hop[st], w // per_hop[st].shape[1], axis=1)
                for st in range(lp1)
            ],
            axis=2,
        )  # (4B, W, L+1, 2, L+1)
    else:
        counts = _walk_position_counts_join(walk_ids, hop_ids, num_nodes)
    return jnp.where((walk_ids != 0)[..., None, None], counts, 0.0)


def _walk_position_counts_join(
    walk_ids: jnp.ndarray, hop_ids: tuple, num_nodes: int
) -> jnp.ndarray:
    """Sorted-key searchsorted join (multiplicity = right - left insertion);
    O(M K^L log) memory-lean fallback for very large walk trees."""
    m, w, lp1 = walk_ids.shape
    b = m // 4
    n_pairs = 2 * b
    li = jnp.concatenate([jnp.arange(b), jnp.arange(2 * b, 3 * b)])
    ri = jnp.concatenate([jnp.arange(b, 2 * b), jnp.arange(3 * b, 4 * b)])
    pair_of_quad = jnp.zeros((m,), jnp.int32)
    pair_of_quad = pair_of_quad.at[li].set(jnp.arange(n_pairs, dtype=jnp.int32))
    pair_of_quad = pair_of_quad.at[ri].set(jnp.arange(n_pairs, dtype=jnp.int32))

    counts = jnp.zeros((m, w, lp1, 2, lp1), jnp.float32)
    # key = pair_row * num_nodes + node_id (int32; asserted in adapter)
    q_keys = pair_of_quad[:, None, None] * num_nodes + walk_ids  # (4B, W, L+1)
    for s, side_rows in enumerate((li, ri)):
        pair_ids = jnp.arange(n_pairs, dtype=jnp.int32)
        for h in range(lp1):
            occ = hop_ids[h][side_rows]  # (2B, K^h)
            occ_keys = jnp.sort(
                (pair_ids[:, None] * num_nodes + occ).reshape(-1)
            )
            left = jnp.searchsorted(occ_keys, q_keys, side="left")
            right = jnp.searchsorted(occ_keys, q_keys, side="right")
            c = (right - left).astype(jnp.float32) / occ.shape[1]
            counts = counts.at[:, :, :, s, h].set(c)
    return counts


class CAWNNet(nn.Module):
    time_feat_dim: int = 100
    position_feat_dim: int = 172
    walk_length: int = 1
    num_walk_heads: int = 8
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32  # computation dtype; params stay float32

    @nn.compact
    def __call__(
        self, tables: FeatureTables, inputs: CAWNInputs, *, train: bool = False
    ) -> jnp.ndarray:
        m, w, lp1 = inputs.walk_ids.shape
        counts = walk_position_counts(
            inputs.walk_ids, inputs.hop_ids, tables.node.shape[0]
        )

        pos_fc1 = nn.Dense(self.position_feat_dim, dtype=self.dtype,
                           name="position_fc1")
        pos_fc2 = nn.Dense(self.position_feat_dim, dtype=self.dtype,
                           name="position_fc2")
        pos_feat = pos_fc2(nn.relu(pos_fc1(counts.astype(self.dtype)))).sum(
            axis=-2
        ).astype(jnp.float32)
        # (4B, W, L+1, position_feat_dim)

        # ---- per-step walk features
        time_enc = TimeEncoder(self.time_feat_dim, name="time_encoder")
        node_feat = tables.node[inputs.walk_ids]
        edge_feat = tables.edge[inputs.walk_eids]
        dt = (inputs.walk_ts[:, :, :1] - inputs.walk_ts).astype(jnp.float32)
        time_feat = time_enc(dt)
        combined = jnp.concatenate(
            [node_feat, time_feat, edge_feat, pos_feat], axis=-1
        )  # (4B, W, L+1, input_dim)

        lengths = (inputs.walk_ids != 0).sum(axis=-1)  # (4B, W)
        input_dim = combined.shape[-1]
        attention_dim = input_dim // 2
        if attention_dim % self.num_walk_heads != 0:
            attention_dim += self.num_walk_heads - attention_dim % self.num_walk_heads

        flat = lambda x: x.reshape(m * w, lp1, x.shape[-1])
        feat_enc = BiLSTMEncoder(input_dim, dtype=self.dtype,
                                 name="feature_encoder")
        pos_enc = BiLSTMEncoder(self.position_feat_dim, dtype=self.dtype,
                                name="position_encoder")
        enc_feat = feat_enc(flat(combined), lengths.reshape(-1)).reshape(m, w, -1)
        enc_pos = pos_enc(flat(pos_feat), lengths.reshape(-1)).reshape(m, w, -1)
        x = jnp.concatenate([enc_feat, enc_pos], axis=-1)
        x = nn.Dense(attention_dim, dtype=self.dtype, name="projection_0")(
            x.astype(self.dtype)
        )
        x = TransformerEncoder(
            attention_dim, self.num_walk_heads, self.dropout,
            dtype=self.dtype, name="walk_transformer",
        )(x.astype(jnp.float32), train=train)
        x = x.mean(axis=-2)
        return nn.Dense(tables.node_dim, name="projection_1")(x)


@dataclasses.dataclass
class CAWN:
    """Backbone adapter for CAWNNet."""

    num_neighbors: int = 32
    walk_length: int = 1
    num_walk_heads: int = 8
    dropout: float = 0.1
    time_feat_dim: int = 100
    position_feat_dim: int = 172
    sample_strategy: str = "time_interval_aware"
    compute_dtype: str = "float32"  # "bfloat16" for MXU single-pass compute
    has_state: bool = False

    def __post_init__(self):
        self.module = CAWNNet(
            time_feat_dim=self.time_feat_dim,
            position_feat_dim=self.position_feat_dim,
            walk_length=self.walk_length,
            num_walk_heads=self.num_walk_heads,
            dropout=self.dropout,
            dtype=jnp.dtype(self.compute_dtype),
        )

    def sample(
        self, csr: TemporalCSR, ids: jnp.ndarray, ts: jnp.ndarray, key: jax.Array
    ) -> CAWNInputs:
        ids = ids.astype(jnp.int32)
        ts = ts.astype(jnp.int32)
        k, L = self.num_neighbors, self.walk_length
        m = ids.shape[0]
        w = k**L
        blocks = sample_multi_hop(csr, ids, ts, k, L, self.sample_strategy, key)

        hop_ids = (ids[:, None],) + tuple(
            blk.nbr.reshape(m, -1) for blk in blocks
        )
        hop_eids = (jnp.zeros((m, 1), jnp.int32),) + tuple(
            blk.eid.reshape(m, -1) for blk in blocks
        )
        hop_ts = (ts[:, None],) + tuple(blk.ts.reshape(m, -1) for blk in blocks)

        def to_walks(hops):
            cols = []
            for h, arr in enumerate(hops):
                cols.append(jnp.repeat(arr, w // arr.shape[1], axis=1))
            return jnp.stack(cols, axis=2)  # (M, W, L+1)

        return CAWNInputs(
            walk_ids=to_walks(hop_ids),
            walk_eids=to_walks(hop_eids),
            walk_ts=to_walks(hop_ts),
            query_ts=ts,
            hop_ids=hop_ids,
        )

    def init(self, key: jax.Array, tables: FeatureTables, csr: TemporalCSR):
        assert 2 * 8 // 4 * tables.node.shape[0] < 2**31
        ids = jnp.zeros((8,), jnp.int32)
        ts = jnp.zeros((8,), jnp.int32)
        inputs = self.sample(csr, ids, ts, jax.random.PRNGKey(0))
        return self.module.init(key, tables, inputs)

    def init_state(self, tables: FeatureTables):
        return None

    def apply(self, params, tables, inputs, *, state=None, train=False, rngs=None):
        return self.module.apply(params, tables, inputs, train=train, rngs=rngs)
