"""TCL: transformer over [target + K recent neighbors] with src<->dst
cross-attention.

Behavioral parity target: models/TCL.py:9-188.

Semantics preserved:
  * sequence = target node prepended to K sampled neighbors, target edge id
    0, target time = interaction time (TCL.py:84-96);
  * features = proj(node) + proj(edge) + proj(time) + depth embedding
    (learned per position, num_depths = K+1, TCL.py:41, 115-128);
  * per layer: self-attention on each side, then cross-attention against
    the OTHER side's post-self-attention features, masked by the other
    side's padding (TCL.py:130-146);
  * output = first token -> Linear (TCL.py:148-152).

TCL is a PAIRED model: the trainer's quad batch
[src || dst || neg_src || neg_dst] is reinterpreted as 2B (left, right)
pairs — (src, dst) and (neg_src, neg_dst) — embedded in one forward, then
scattered back to quad order.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph.csr import TemporalCSR
from ..graph.sampler import sample_neighbors
from ..nn.modules import TimeEncoder, TorchLinear, TransformerEncoder, uniform_init
from .base import FeatureTables


class TCLInputs(NamedTuple):
    """Per-side sequences for the 4B quad (pairing done in apply)."""

    seq_ids: jnp.ndarray  # (4B, K+1) int32 — target at position 0
    seq_eids: jnp.ndarray  # (4B, K+1)
    seq_ts: jnp.ndarray  # (4B, K+1) int32
    query_ts: jnp.ndarray  # (4B,) int32


class TCLNet(nn.Module):
    time_feat_dim: int = 100
    num_layers: int = 2
    num_heads: int = 2
    num_depths: int = 21  # num_neighbors + 1
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self, tables: FeatureTables, inputs: TCLInputs, *,
        train: bool = False, triple: bool = False,
    ) -> jnp.ndarray:
        d = tables.node_dim
        time_enc = TimeEncoder(self.time_feat_dim, name="time_encoder")
        # torch nn.Embedding init is N(0, 1) (flax's default is fan-in
        # scaled — init parity matters, see TorchLinear)
        depth_emb = nn.Embed(
            self.num_depths, d, name="depth_embedding",
            embedding_init=nn.initializers.normal(1.0),
        )

        node_f = TorchLinear(d, name="proj_node")(tables.node[inputs.seq_ids])
        edge_f = TorchLinear(d, name="proj_edge")(tables.edge[inputs.seq_eids])
        dt = (inputs.query_ts[:, None] - inputs.seq_ts).astype(jnp.float32)
        time_f = TorchLinear(d, name="proj_time")(time_enc(dt))
        depth_f = depth_emb(jnp.arange(inputs.seq_ids.shape[1]))
        feats = node_f + edge_f + time_f + depth_f  # (4B, K+1, d)
        masks = inputs.seq_ids != 0  # target position is always valid

        m = feats.shape[0]
        if triple:
            # training triple [src||dst||neg_dst] (neg_src = src and
            # 'recent' sampling is deterministic): src's per-row features
            # were computed once above and feed BOTH pairs — exact
            b = m // 3
            left_idx = jnp.concatenate([jnp.arange(b), jnp.arange(b)])
            right_idx = jnp.concatenate(
                [jnp.arange(b, 2 * b), jnp.arange(2 * b, 3 * b)]
            )
        else:
            # pair up: left = [src, neg_src], right = [dst, neg_dst]
            b = m // 4
            left_idx = jnp.concatenate(
                [jnp.arange(b), jnp.arange(2 * b, 3 * b)]
            )
            right_idx = jnp.concatenate(
                [jnp.arange(b, 2 * b), jnp.arange(3 * b, 4 * b)]
            )
        lf, rf = feats[left_idx], feats[right_idx]
        lm, rm = masks[left_idx], masks[right_idx]

        for i in range(self.num_layers):
            transformer = TransformerEncoder(
                d, self.num_heads, self.dropout, name=f"transformer_{i}"
            )
            lf_sa = transformer(lf, lf, lf, lm, train=train)
            rf_sa = transformer(rf, rf, rf, rm, train=train)
            lf_new = transformer(lf_sa, rf_sa, rf_sa, rm, train=train)
            rf_new = transformer(rf_sa, lf_sa, lf_sa, lm, train=train)
            lf, rf = lf_new, rf_new

        output = TorchLinear(d, name="output_layer")
        out_left = output(lf[:, 0, :])
        out_right = output(rf[:, 0, :])
        # scatter back to [src, dst, neg_src, neg_dst] order
        return jnp.concatenate(
            [out_left[:b], out_right[:b], out_left[b:], out_right[b:]], axis=0
        )


@dataclasses.dataclass
class TCL:
    """Backbone adapter for TCLNet (paired model)."""

    num_neighbors: int = 20
    num_layers: int = 2
    num_heads: int = 2
    dropout: float = 0.1
    time_feat_dim: int = 100
    sample_strategy: str = "recent"
    has_state: bool = False
    pair_independent: bool = False  # src<->dst cross-attention is pair-aware
    triple_expand: bool = True  # see DyGFormer.triple_expand (exact reuse)

    def __post_init__(self):
        self.module = TCLNet(
            time_feat_dim=self.time_feat_dim,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            num_depths=self.num_neighbors + 1,
            dropout=self.dropout,
        )

    def sample(
        self, csr: TemporalCSR, ids: jnp.ndarray, ts: jnp.ndarray, key: jax.Array
    ) -> TCLInputs:
        ids = ids.astype(jnp.int32)
        ts = ts.astype(jnp.int32)
        blk = sample_neighbors(
            csr, ids, ts, self.num_neighbors, self.sample_strategy, key
        )
        zeros = jnp.zeros_like(ids)[:, None]
        return TCLInputs(
            seq_ids=jnp.concatenate([ids[:, None], blk.nbr], axis=1),
            seq_eids=jnp.concatenate([zeros, blk.eid], axis=1),
            seq_ts=jnp.concatenate([ts[:, None], blk.ts], axis=1),
            query_ts=ts,
        )

    def init(self, key: jax.Array, tables: FeatureTables, csr: TemporalCSR):
        ids = jnp.zeros((8,), jnp.int32)
        ts = jnp.zeros((8,), jnp.int32)
        inputs = self.sample(csr, ids, ts, jax.random.PRNGKey(0))
        return self.module.init(key, tables, inputs)

    def init_state(self, tables: FeatureTables):
        return None

    def apply(self, params, tables, inputs, *, state=None, train=False,
              rngs=None, triple=False):
        return self.module.apply(
            params, tables, inputs, train=train, triple=triple, rngs=rngs
        )
