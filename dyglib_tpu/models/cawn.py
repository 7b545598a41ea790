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
    string-keyed dict + np.unique becomes a fused equality-compare + reduce
    over the hop tables (sorted-key searchsorted join as the memory-lean
    fallback for very large trees);
  * WalkEncoder: [node || time || edge || position] per step -> BiLSTM
    taking the output at each walk's last valid position (packed-sequence
    semantics, CAWN.py:358-396); position feats through a second BiLSTM;
    concat, project to attention_dim = ceil(input_dim/2 to num_walk_heads),
    shared post-LN TransformerEncoder over walks, mean-pool, project
    (CAWN.py:292-355).

TPU-native structure — tree-factored walk encoding: every per-walk-step
quantity (raw features, Phi(dt), position counts, LSTM gate projections) is
a repeat-expansion of a HOP TABLE entry (walk step st enumerates hop table
st; CAWN.py:130-164 builds walks exactly this way). So features, the
position MLP, and the BiLSTM input/recurrent matmuls all run at hop
granularity — sum_st K^st rows instead of (L+1) * K^L — and results are
broadcast to walk granularity only at the final select/attention stage.
At the shipped configs this roughly halves (L=1) to thirds (L=2) the
dominant gathers/matmuls/elementwise of the step (trace:
scripts/trace_ops.py).

BiLSTM note: the reference packs each walk to its valid length v and reads
the output at position v-1; for the reversed direction that position is the
FIRST step of the backward pass, so the exact equivalent is a forward
LSTM scan (read h at v-1) plus ONE backward-cell step on input v-1 from the
zero state — no full reverse scan needed. Gate projections are fused
(one (D, 4H) input matmul per hop level + one (H, 4H) recurrent matmul per
step, standard i,f,g,o gates) instead of flax LSTMCell's 8 narrow Denses.

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
from ..nn.modules import TimeEncoder, TorchLinear, TransformerEncoder, uniform_init
from .base import FeatureTables


class CAWNInputs(NamedTuple):
    walk_ids: jnp.ndarray  # (4B, W, L+1) int32 (lengths + parity oracles)
    query_ts: jnp.ndarray  # (4B,) int32
    hop_ids: tuple  # st = 0..L: (4B, K^st) node ids
    hop_eids: tuple  # st = 0..L: (4B, K^st) edge ids (0 at st=0)
    hop_ts: tuple  # st = 0..L: (4B, K^st) int32 time keys


def _expand_to_walks(arr: jnp.ndarray, w: int) -> jnp.ndarray:
    """(M, K^st, ...) hop-level values -> (M, W, ...) walk-level via the
    repeat alignment walks are built with (CAWN.py:130-164)."""
    return jnp.repeat(arr, w // arr.shape[1], axis=1)


def _quad_partner(m: int):
    """Partner row + left-ness for quad batches [src||dst||neg_src||neg_dst]:
    pairs are (q, q+b) for left rows and (q, q-b) for right rows."""
    b = m // 4
    ar = jnp.arange(b, dtype=jnp.int32)
    partner = jnp.concatenate([ar + b, ar, ar + 3 * b, ar + 2 * b])
    is_left = jnp.concatenate([jnp.ones(b, bool), jnp.zeros(b, bool)] * 2)
    return partner, is_left[:, None]


def hop_position_counts(hop_ids: tuple, num_nodes: int) -> tuple:
    """Landing-probability counts at hop granularity: per hop table st a
    (4B, K^st, 2, L+1) array whose cell [..., s, h] = (occurrences of the
    entry's node at hop h of side s's occurrence tree) / K^h — the reference
    PositionEncoder's dict of "{batch_idx}-{node_id}" keys accumulating
    1/num_neighbors_at_hop per visit over the src- and dst-rooted trees
    (CAWN.py:197-289). Pad entries (node id 0) are zeroed.

    Fast path: fused equality-compare + reduce between hop tables (the TPU
    sort + double-searchsorted join this replaces measured 50 ms of CAWN's
    80 ms step at B=200, K=32, L=1); the join survives as the fallback for
    walk trees too large to compare blockwise.
    """
    m = hop_ids[0].shape[0]
    lp1 = len(hop_ids)
    biggest = max(h.shape[1] for h in hop_ids)
    if m * biggest * biggest <= 1 << 28:
        partner, is_left = _quad_partner(m)
        per_hop = []
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
    else:
        per_hop = _hop_position_counts_join(hop_ids, num_nodes)
    return tuple(
        jnp.where((hop_ids[st] != 0)[..., None, None], per_hop[st], 0.0)
        for st in range(lp1)
    )


def walk_position_counts(
    walk_ids: jnp.ndarray, hop_ids: tuple, num_nodes: int
) -> jnp.ndarray:
    """Walk-level counts (4B, W, L+1, 2, L+1): the hop-level counts expanded
    along the walk repeat alignment. Kept as the parity surface against the
    reference PositionEncoder (walk step st IS hop entry st)."""
    w = walk_ids.shape[1]
    per_hop = hop_position_counts(hop_ids, num_nodes)
    counts = jnp.stack([_expand_to_walks(c, w) for c in per_hop], axis=2)
    return jnp.where((walk_ids != 0)[..., None, None], counts, 0.0)


def _pair_keys(hop_ids: tuple, num_nodes: int):
    """(pair row, node id) -> sortable int32 keys + side row indices."""
    m = hop_ids[0].shape[0]
    b = m // 4
    li = jnp.concatenate([jnp.arange(b), jnp.arange(2 * b, 3 * b)])
    ri = jnp.concatenate([jnp.arange(b, 2 * b), jnp.arange(3 * b, 4 * b)])
    n_pairs = 2 * b
    pair_of_quad = jnp.zeros((m,), jnp.int32)
    pair_of_quad = pair_of_quad.at[li].set(jnp.arange(n_pairs, dtype=jnp.int32))
    pair_of_quad = pair_of_quad.at[ri].set(jnp.arange(n_pairs, dtype=jnp.int32))
    return li, ri, n_pairs, pair_of_quad


def _hop_position_counts_join(hop_ids: tuple, num_nodes: int) -> list:
    """Sorted-key searchsorted join (multiplicity = right - left insertion);
    memory-lean fallback for very large walk trees, hop-granularity queries."""
    lp1 = len(hop_ids)
    li, ri, n_pairs, pair_of_quad = _pair_keys(hop_ids, num_nodes)
    pair_ids = jnp.arange(n_pairs, dtype=jnp.int32)

    out = []
    for st in range(lp1):
        q_keys = pair_of_quad[:, None] * num_nodes + hop_ids[st]  # (4B, K^st)
        counts = jnp.zeros(q_keys.shape + (2, lp1), jnp.float32)
        for s, side_rows in enumerate((li, ri)):
            for h in range(lp1):
                occ = hop_ids[h][side_rows]  # (2B, K^h)
                occ_keys = jnp.sort(
                    (pair_ids[:, None] * num_nodes + occ).reshape(-1)
                )
                left = jnp.searchsorted(occ_keys, q_keys, side="left")
                right = jnp.searchsorted(occ_keys, q_keys, side="right")
                c = (right - left).astype(jnp.float32) / occ.shape[1]
                counts = counts.at[:, :, s, h].set(c)
        out.append(counts)
    return out


def _walk_position_counts_join(
    walk_ids: jnp.ndarray, hop_ids: tuple, num_nodes: int
) -> jnp.ndarray:
    """Walk-granularity join (kept as the cross-check surface for the fast
    path; hop-granularity queries are strictly cheaper — see
    _hop_position_counts_join)."""
    m, w, lp1 = walk_ids.shape
    li, ri, n_pairs, pair_of_quad = _pair_keys(hop_ids, num_nodes)
    pair_ids = jnp.arange(n_pairs, dtype=jnp.int32)

    counts = jnp.zeros((m, w, lp1, 2, lp1), jnp.float32)
    q_keys = pair_of_quad[:, None, None] * num_nodes + walk_ids  # (4B, W, L+1)
    for s, side_rows in enumerate((li, ri)):
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


class TreeBiLSTMEncoder(nn.Module):
    """Packed-sequence BiLSTM over walks, evaluated on the hop tree
    (CAWN.py:358-396). hidden_dim is split across the two directions.

    Inputs are per-hop feature tables ``hop_x[st]: (M, K^st, D)``; the LSTM
    runs at hop granularity (states broadcast from parent to children
    between steps — children of parent p are the contiguous block
    p*K..p*K+K-1 of the next hop, the same repeat alignment walks use) and
    only the final read-at-last-valid-position expands to walk granularity.
    """

    hidden_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hop_x: tuple, lengths: jnp.ndarray) -> jnp.ndarray:
        """hop_x[st]: (M, K^st, D); lengths: (M, W) valid walk lengths >= 1
        -> (M, W, 2*(hidden_dim//2))."""
        hop_x = [x.astype(self.dtype) for x in hop_x]
        m, _, d = hop_x[0].shape
        t = len(hop_x)
        w = lengths.shape[1]
        h1 = self.hidden_dim // 2

        def gate_params(prefix):
            # torch nn.LSTM init: every weight and BOTH bias vectors
            # U(+-1/sqrt(hidden)). b_ih and b_hh are kept separate for
            # exact init-distribution parity (their sum is triangular, not
            # uniform — init distributions are metrics-visible, see
            # TorchLinear); the recurrent term at step 0 is exactly b_hh
            # since h0 = 0.
            init = uniform_init(h1 ** -0.5)
            wx = self.param(f"{prefix}_wx", init, (d, 4 * h1)).astype(self.dtype)
            wh = self.param(f"{prefix}_wh", init, (h1, 4 * h1)).astype(self.dtype)
            bi = self.param(f"{prefix}_b", init, (4 * h1,)).astype(self.dtype)
            bh = self.param(f"{prefix}_bh", init, (4 * h1,)).astype(self.dtype)
            return wx, wh, bi + bh

        def cell(gates, c):
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
            return c_new, nn.sigmoid(o) * jnp.tanh(c_new)

        def select_last(hs):
            """hs[st]: (M, K^st, h) -> value at each walk's last valid step."""
            out = jnp.zeros((m, w, hs[0].shape[-1]), self.dtype)
            for st, h_st in enumerate(hs):
                out = jnp.where(
                    (lengths == st + 1)[..., None],
                    _expand_to_walks(h_st, w),
                    out,
                )
            return out

        # forward direction: scan down the tree
        wx_f, wh_f, b_f = gate_params("fwd")
        c = jnp.zeros((m, 1, h1), self.dtype)
        h = None  # h0 = 0: recurrent term at step 0 is exactly zero
        hs = []
        for st in range(t):
            kst = hop_x[st].shape[1]
            gates = hop_x[st] @ wx_f + b_f
            if h is not None:
                rep = kst // h.shape[1]
                c = jnp.repeat(c, rep, axis=1)
                gates = gates + jnp.repeat(h, rep, axis=1) @ wh_f
            c, h = cell(gates, c)
            hs.append(h)
        h_fwd = select_last(hs)

        # backward direction's output at the last valid position is its
        # first step: one cell application on x[v-1] from the zero state
        # (h0 = 0 elides the recurrent matmul; wh still exists for
        # checkpoint-shape parity with a full BiLSTM)
        wx_b, wh_b, b_b = gate_params("bwd")
        del wh_b
        hs_b = [
            cell(x @ wx_b + b_b, jnp.zeros((m, x.shape[1], h1), self.dtype))[1]
            for x in hop_x
        ]
        h_bwd = select_last(hs_b)
        return jnp.concatenate([h_fwd, h_bwd], axis=-1).astype(jnp.float32)


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
        hop_counts = hop_position_counts(inputs.hop_ids, tables.node.shape[0])

        pos_fc1 = TorchLinear(self.position_feat_dim, dtype=self.dtype,
                              name="position_fc1")
        pos_fc2 = TorchLinear(self.position_feat_dim, dtype=self.dtype,
                              name="position_fc2")
        # (4B, K^st, position_feat_dim) per hop; summed over src/dst roots
        pos_hop = tuple(
            pos_fc2(nn.relu(pos_fc1(c.astype(self.dtype)))).sum(axis=-2)
            for c in hop_counts
        )

        # ---- per-hop walk-step features [node || time || edge || position]
        time_enc = TimeEncoder(self.time_feat_dim, name="time_encoder")
        combined_hop = []
        for st in range(lp1):
            node_f = tables.node[inputs.hop_ids[st]]
            edge_f = tables.edge[inputs.hop_eids[st]]
            dt = (inputs.query_ts[:, None] - inputs.hop_ts[st]).astype(
                jnp.float32
            )
            combined_hop.append(
                jnp.concatenate(
                    [
                        node_f.astype(self.dtype),
                        time_enc(dt).astype(self.dtype),
                        edge_f.astype(self.dtype),
                        pos_hop[st],
                    ],
                    axis=-1,
                )
            )
        lengths = (inputs.walk_ids != 0).sum(axis=-1)  # (4B, W)

        input_dim = combined_hop[0].shape[-1]
        attention_dim = input_dim // 2
        if attention_dim % self.num_walk_heads != 0:
            attention_dim += self.num_walk_heads - attention_dim % self.num_walk_heads

        feat_enc = TreeBiLSTMEncoder(input_dim, dtype=self.dtype,
                                     name="feature_encoder")
        pos_enc = TreeBiLSTMEncoder(self.position_feat_dim, dtype=self.dtype,
                                    name="position_encoder")
        enc_feat = feat_enc(combined_hop, lengths)  # (4B, W, ~input_dim)
        enc_pos = pos_enc(pos_hop, lengths)  # (4B, W, ~pos_dim)
        x = jnp.concatenate([enc_feat, enc_pos], axis=-1)
        x = TorchLinear(attention_dim, dtype=self.dtype, name="projection_0")(
            x.astype(self.dtype)
        )
        x = TransformerEncoder(
            attention_dim, self.num_walk_heads, self.dropout,
            dtype=self.dtype, name="walk_transformer",
        )(x.astype(jnp.float32), train=train)
        x = x.mean(axis=-2)
        return TorchLinear(tables.node_dim, name="projection_1")(x)


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
    # "auto" resolves to bfloat16 on TPU, float32 elsewhere (round 5):
    # CAWN is the one family where bf16 compute is a measured 1.19x
    # (19.6 -> 16.5 ms/step interleaved A/B — its walk transformer and
    # BiLSTM run on small/odd-dim operands whose relayouts are
    # byte-bound, unlike the flagship where bf16 measured neutral), and
    # the end metric is neutral on-chip (8-epoch calibration, 2 seeds:
    # f32 0.8835+-0.0024 vs bf16 0.8886+-0.0040 best val AP). CPU parity
    # tests resolve to f32 and keep exercising the torch-matching math.
    compute_dtype: str = "auto"
    has_state: bool = False
    pair_independent: bool = False  # position encoder is pair-aware

    def __post_init__(self):
        cd = self.compute_dtype
        if cd == "auto":
            cd = (
                "bfloat16" if jax.default_backend() == "tpu" else "float32"
            )
        self.module = CAWNNet(
            time_feat_dim=self.time_feat_dim,
            position_feat_dim=self.position_feat_dim,
            walk_length=self.walk_length,
            num_walk_heads=self.num_walk_heads,
            dropout=self.dropout,
            dtype=jnp.dtype(cd),
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

        walk_ids = jnp.stack(
            [_expand_to_walks(arr, w) for arr in hop_ids], axis=2
        )  # (M, W, L+1)
        return CAWNInputs(
            walk_ids=walk_ids,
            query_ts=ts,
            hop_ids=hop_ids,
            hop_eids=hop_eids,
            hop_ts=hop_ts,
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
