"""Backbone adapter protocol shared by all models.

The reference gives every model the uniform method
``compute_src_dst_node_temporal_embeddings(src, dst, t) -> (src_emb, dst_emb)``
(SURVEY §1 L4). The TPU-native equivalent splits that into two phases so the
whole training step stays inside one jit:

  * ``sample(csr, ids, ts, key)`` — stochastic neighborhood construction
    (device-side, fixed shapes);
  * ``apply(params, tables, inputs, train, rngs)`` — the differentiable
    compute over the sampled inputs.

Both positive and negative pairs are embedded in ONE batched forward over
``concat([src, dst, neg_src, neg_dst])``: the reference computes negatives
and positives in separate calls against the same memory view
(train_link_prediction.py:186-207), so batching them is equivalent and keeps
the MXU fed.

Stateful backbones (the TGN family) thread an explicit ``state`` pytree;
stateless ones use ``state=None``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Protocol

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FeatureTables:
    """Raw feature tables, device-resident (row 0 = padding sentinel).

    Registered as a pytree so tables can be passed through jit boundaries
    and sharded explicitly (feature-column sharding over the model axis).
    """

    node: jnp.ndarray  # (N, 172) float32
    edge: jnp.ndarray  # (E+1, 172) float32

    @property
    def node_dim(self) -> int:
        return self.node.shape[1]

    @property
    def edge_dim(self) -> int:
        return self.edge.shape[1]


class Backbone(Protocol):
    """What the trainers require of every model family."""

    has_state: bool

    def init(self, key: jax.Array, tables: FeatureTables, csr) -> Any:
        """Initialize parameters (traced on a tiny dummy batch)."""

    def init_state(self, tables: FeatureTables) -> Any:
        """Fresh mutable state (memory models) or None."""

    def sample(self, csr, ids: jnp.ndarray, ts: jnp.ndarray, key: jax.Array):
        """Build fixed-shape neighborhood inputs for a flat id/time batch."""

    def apply(
        self,
        params,
        tables: FeatureTables,
        inputs,
        *,
        state=None,
        train: bool = False,
        rngs: dict | None = None,
    ) -> jnp.ndarray:
        """Embed the flat batch -> (M, node_dim)."""
