"""GraphMixer: MLP-mixer link encoder + time-gap node encoder.

Behavioral parity target: models/GraphMixer.py:9-233.

Semantics preserved:
  * frozen (non-trainable) TimeEncoder (GraphMixer.py:45);
  * link encoder over K recent neighbors: [edge_feat || Phi(dt)] with time
    features ZEROED on padded rows (GraphMixer.py:102-103), projected to
    edge_feat_dim channels, ``num_layers`` MLPMixer blocks (token-mix
    expansion 0.5 over K, channel-mix expansion 4.0, GELU FFNs, pre-norm
    residuals, GraphMixer.py:189-233), then an UNMASKED mean over all K
    token rows (GraphMixer.py:115 — pads contribute their projected bias,
    reproduced faithfully);
  * node encoder: up to ``time_gap`` recent neighbors' raw node features,
    softmax-of-{1,-1e10}-mask scores then torch.mean — algebraically
    mean(valid features) / time_gap, with all-empty rows -> 0
    (GraphMixer.py:119-137, the "softmax-then-mean quirk"); plus the node's
    own raw features; output = Linear(concat(link_feat, node_feat))
    (GraphMixer.py:139-143).

TPU-native shape note: the (B, time_gap) neighbor sample is only needed for
ids+mask; the masked mean avoids materializing the reference's
(B, time_gap, 172) gather ordering but is numerically identical.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph.csr import TemporalCSR
from ..graph.sampler import sample_neighbors, window_bounds
from ..nn.modules import LN_EPS, TimeEncoder, TorchLinear
from .base import FeatureTables


class FeedForwardNet(nn.Module):
    """Two-layer GELU MLP with expansion factor (GraphMixer.py:159-186)."""

    input_dim: int
    dim_expansion_factor: float
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        h = TorchLinear(int(self.dim_expansion_factor * self.input_dim), name="fc1")(x)
        # exact-erf GELU (torch nn.GELU default), not the tanh approximation
        h = nn.Dropout(self.dropout, deterministic=not train)(
            nn.gelu(h, approximate=False)
        )
        h = TorchLinear(self.input_dim, name="fc2")(h)
        return nn.Dropout(self.dropout, deterministic=not train)(h)


class MLPMixer(nn.Module):
    """Token-mix + channel-mix block with pre-norm residuals
    (GraphMixer.py:189-233)."""

    num_tokens: int
    num_channels: int
    token_dim_expansion_factor: float = 0.5
    channel_dim_expansion_factor: float = 4.0
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        # token mixing over the K axis
        h = nn.LayerNorm(epsilon=LN_EPS, name="token_norm")(x.transpose(0, 2, 1))
        h = FeedForwardNet(
            self.num_tokens, self.token_dim_expansion_factor, self.dropout,
            name="token_ff",
        )(h, train=train).transpose(0, 2, 1)
        x = x + h
        # channel mixing
        h = nn.LayerNorm(epsilon=LN_EPS, name="channel_norm")(x)
        h = FeedForwardNet(
            self.num_channels, self.channel_dim_expansion_factor, self.dropout,
            name="channel_ff",
        )(h, train=train)
        return x + h


class GraphMixerInputs(NamedTuple):
    query_ts: jnp.ndarray  # (B,) int32
    nbr_eids: jnp.ndarray  # (B, K) int32
    nbr_ts: jnp.ndarray  # (B, K) int32
    nbr_mask: jnp.ndarray  # (B, K) bool
    node_ids: jnp.ndarray  # (B,) int32
    # node-encoder window, one of two layouts (fixed per model config):
    #   gather mode: tg_ids/tg_mask are (B, time_gap), tg_sum/tg_cnt None
    #   prefix mode: tg_sum (B, Dn) = window feature sum, tg_cnt (B,) =
    #     window size, tg_ids/tg_mask None (O(1) per query via the CSR's
    #     per-segment feature prefix sums instead of a (B, time_gap, Dn)
    #     gather — numerically ~1e-6 of the gather, see csr.feat_prefix)
    tg_ids: jnp.ndarray | None = None
    tg_mask: jnp.ndarray | None = None
    tg_sum: jnp.ndarray | None = None
    tg_cnt: jnp.ndarray | None = None


class GraphMixerNet(nn.Module):
    time_feat_dim: int = 100
    num_tokens: int = 20
    num_layers: int = 2
    token_dim_expansion_factor: float = 0.5
    channel_dim_expansion_factor: float = 4.0
    dropout: float = 0.1
    time_gap: int = 2000

    @nn.compact
    def __call__(
        self, tables: FeatureTables, inputs: GraphMixerInputs, *, train: bool = False
    ) -> jnp.ndarray:
        num_channels = tables.edge_dim
        time_enc = TimeEncoder(self.time_feat_dim, trainable=False, name="time_encoder")

        # ---- link encoder
        edge_feats = tables.edge[inputs.nbr_eids]  # (B, K, De)
        dt = (inputs.query_ts[:, None] - inputs.nbr_ts).astype(jnp.float32)
        time_feats = time_enc(dt)  # (B, K, Dt)
        time_feats = jnp.where(inputs.nbr_mask[..., None], time_feats, 0.0)
        x = jnp.concatenate([edge_feats, time_feats], axis=-1)
        x = TorchLinear(num_channels, name="projection_layer")(x)
        for i in range(self.num_layers):
            x = MLPMixer(
                self.num_tokens, num_channels,
                self.token_dim_expansion_factor,
                self.channel_dim_expansion_factor,
                self.dropout, name=f"mlp_mixer_{i}",
            )(x, train=train)
        link_feat = x.mean(axis=1)  # unmasked mean incl. pad rows (parity)

        # ---- node encoder: mean of valid neighbor raw feats / time_gap
        if inputs.tg_sum is not None:
            cnt = inputs.tg_cnt.astype(jnp.float32)
            agg = inputs.tg_sum / jnp.maximum(cnt, 1.0)[:, None] / float(
                self.time_gap
            )
            agg = jnp.where((cnt > 0)[:, None], agg, 0.0)
        else:
            tg_feats = tables.node[inputs.tg_ids]  # (B, G, Dn)
            m = inputs.tg_mask[..., None].astype(jnp.float32)
            n_valid = jnp.maximum(m.sum(axis=1), 1.0)
            agg = (tg_feats * m).sum(axis=1) / n_valid / float(self.time_gap)
            agg = jnp.where(inputs.tg_mask.any(axis=1)[:, None], agg, 0.0)
        node_feat = agg + tables.node[inputs.node_ids]

        return TorchLinear(tables.node_dim, name="output_layer")(
            jnp.concatenate([link_feat, node_feat], axis=-1)
        )


@dataclasses.dataclass
class GraphMixer:
    """Backbone adapter for GraphMixerNet."""

    num_neighbors: int = 20  # num_tokens
    num_layers: int = 2
    time_feat_dim: int = 100
    token_dim_expansion_factor: float = 0.5
    channel_dim_expansion_factor: float = 4.0
    dropout: float = 0.1
    time_gap: int = 2000
    sample_strategy: str = "recent"
    has_state: bool = False
    pair_independent: bool = True  # see TGAT: trainer reuses src as neg_src
    # node-encoder aggregation: "prefix" uses the CSR's per-segment feature
    # prefix sums (O(1) per query; requires the `recent` strategy, where the
    # time_gap window is a contiguous CSR range); "gather" materializes the
    # (B, time_gap, Dn) gather like the reference; "auto" picks prefix when
    # available on the CSR
    node_encoder_mode: str = "auto"  # "auto" | "prefix" | "gather"

    @property
    def wants_feat_prefix(self) -> bool:
        """Trainer hint: build csr.feat_prefix for this backbone."""
        return (
            self.node_encoder_mode in ("auto", "prefix")
            and self.sample_strategy == "recent"
        )

    def __post_init__(self):
        self.module = GraphMixerNet(
            time_feat_dim=self.time_feat_dim,
            num_tokens=self.num_neighbors,
            num_layers=self.num_layers,
            token_dim_expansion_factor=self.token_dim_expansion_factor,
            channel_dim_expansion_factor=self.channel_dim_expansion_factor,
            dropout=self.dropout,
            time_gap=self.time_gap,
        )

    def sample(
        self, csr: TemporalCSR, ids: jnp.ndarray, ts: jnp.ndarray, key: jax.Array
    ) -> GraphMixerInputs:
        blk = sample_neighbors(
            csr, ids, ts, self.num_neighbors, self.sample_strategy, key
        )
        common = dict(
            query_ts=ts.astype(jnp.int32),
            nbr_eids=blk.eid,
            nbr_ts=blk.ts,
            nbr_mask=blk.mask,
            node_ids=ids.astype(jnp.int32),
        )
        if self.wants_feat_prefix and csr.feat_prefix is not None:
            # the `recent` time_gap window is the contiguous CSR range
            # [max(lo, hi - time_gap), hi): its feature sum is a 2-row
            # prefix-table read instead of a (B, time_gap, Dn) gather
            lo, hi = window_bounds(csr, ids, ts)
            lo2 = jnp.maximum(lo, hi - self.time_gap)
            cnt = hi - lo2
            top = csr.feat_prefix[jnp.maximum(hi - 1, 0)]
            bot = jnp.where(
                (lo2 > lo)[:, None],
                csr.feat_prefix[jnp.maximum(lo2 - 1, 0)],
                0.0,
            )
            tg_sum = jnp.where((cnt > 0)[:, None], top - bot, 0.0)
            return GraphMixerInputs(**common, tg_sum=tg_sum, tg_cnt=cnt)
        if self.node_encoder_mode == "prefix":
            raise ValueError(
                "node_encoder_mode='prefix' needs a CSR built with "
                "feat_prefix_of=node_features and the 'recent' strategy"
            )
        # gather mode: reference reuses get_historical_neighbors with
        # num_neighbors=time_gap (GraphMixer.py:120-122)
        tg = sample_neighbors(
            csr, ids, ts, self.time_gap, self.sample_strategy,
            None if key is None else jax.random.fold_in(key, 1),
        )
        return GraphMixerInputs(**common, tg_ids=tg.nbr, tg_mask=tg.mask)

    def init(self, key: jax.Array, tables: FeatureTables, csr: TemporalCSR):
        ids = jnp.zeros((2,), jnp.int32)
        ts = jnp.zeros((2,), jnp.int32)
        inputs = self.sample(csr, ids, ts, jax.random.PRNGKey(0))
        return self.module.init(key, tables, inputs)

    def init_state(self, tables: FeatureTables):
        return None

    def apply(self, params, tables, inputs, *, state=None, train=False, rngs=None):
        return self.module.apply(params, tables, inputs, train=train, rngs=rngs)
