"""TGAT: temporal graph attention network, unrolled for TPU.

Behavioral parity target: models/TGAT.py:9-147. The reference computes an
L-layer embedding by Python recursion with O(K^L) fan-out, re-sampling
neighbors inside every recursive call. Here the multi-hop neighborhood is
sampled ONCE into fixed-shape hop tensors (hop h: (B, K^h)) and the layers
are evaluated bottom-up:

    feats^0[h]   = raw_node_features[hop_ids[h]]
    feats^l[h]   = Merge_l(MHA_l(q=feats^{l-1}[h],
                                 kv=feats^{l-1}[h+1] || edge || Phi(dt)),
                           raw[hop_ids[h]])
    output       = feats^L[0]

This is mathematically identical to the recursion for the deterministic
``recent`` strategy and distribution-equivalent for stochastic strategies
(the reference re-draws neighbors per recursive branch; see SURVEY §7 "RNG
parity"). Layer l uses conv/merge parameters shared across hop levels,
exactly like temporal_conv_layers[l-1] in the recursion (TGAT.py:125, 134).

Semantics preserved: self time feature Phi(0) (TGAT.py:80-82); neighbor
time features Phi(t_query - t_neighbor) (TGAT.py:114-119); attention mask
from neighbor id == 0; layer-0 features are raw node features (TGAT.py:86).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph.csr import TemporalCSR
from ..graph.sampler import fetch_entry_windows, sample_multi_hop
from ..nn.modules import MergeLayer, TemporalMultiHeadAttention, TimeEncoder
from .base import FeatureTables


class TGATInputs(NamedTuple):
    """Precomputed hop tensors; level h arrays have shape (B, K**h)."""

    hop_ids: tuple  # h = 0..L: node ids (level 0 = query nodes)
    hop_eids: tuple  # h = 1..L: edge ids into the feature table
    hop_ts: tuple  # h = 0..L: int32 time keys (level 0 = query times)
    hop_mask: tuple  # h = 1..L: validity masks
    # window-fetched features for hops 1..L (csr.feat_entry path, 'recent'
    # strategy only): h-indexed tuples of (B, K**h, Dn) / (B, K**h, De)
    # arrays, value-identical to tables.node[hop_ids[h]] /
    # tables.edge[hop_eids[h]] (invalid entries zeroed like id-0 rows).
    # None -> the net gathers rows from the tables as before.
    # (fused window-kernel mode: only hops 1..L-1 are present — the last
    # hop's features are fetched inside the attention kernel.)
    hop_node_feat: tuple | None = None
    hop_edge_feat: tuple | None = None
    # fused window-gather attention (ops/pallas/window_attention.py):
    # per-hop CLAMPED entry-table window starts (shape = hop h's query
    # shape) and the entry table itself (csr.feat_entry — same buffer, no
    # copy; sampling runs inside the jitted step)
    hop_win_start: tuple | None = None
    feat_table: jnp.ndarray | None = None


class TGATNet(nn.Module):
    """The differentiable part of TGAT (see module docstring)."""

    time_feat_dim: int = 100
    num_layers: int = 2
    num_heads: int = 2
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False  # fused attention kernel (same params/math)
    use_window_kernel: bool = False  # fused gather+attention at layer 1
    use_gathered_kernel: bool = False  # post-gather fused attention at l=1
    # fused Phi(dt) @ W_phi K/V contribution (ops/pallas/phi_projection.py):
    # the (M*K, Dt) time-feature tensor and the kv concatenate never exist
    # in HBM; applies at every layer of the plain path
    use_phi_fusion: bool = False
    # split-input K/V projections (see TemporalMultiHeadAttention.split_kv)
    split_kv: bool = False

    @nn.compact
    def __call__(
        self, tables: FeatureTables, inputs: TGATInputs, *, train: bool = False
    ) -> jnp.ndarray:
        L = self.num_layers
        time_enc = TimeEncoder(self.time_feat_dim, name="time_encoder")
        convs = [
            TemporalMultiHeadAttention(
                self.num_heads, self.dropout, dtype=self.dtype,
                use_pallas=self.use_pallas, split_kv=self.split_kv,
                name=f"temporal_conv_{l}",
            )
            for l in range(L)
        ]
        merges = [
            MergeLayer(tables.node_dim, tables.node_dim, name=f"merge_{l}")
            for l in range(L)
        ]
        # layer-1 kv rows are RAW features -> the fused kernel may own
        # their fetch (contiguous 'recent' windows) + Phi(dt) + attention
        fused = self.use_window_kernel and inputs.hop_win_start is not None

        b = inputs.hop_ids[0].shape[0]
        # flat node ids / times per hop level; level h has m_h = b * K^h rows
        flat_ids = [ids.reshape(-1) for ids in inputs.hop_ids]
        flat_ts = [ts.reshape(-1) for ts in inputs.hop_ts]
        if inputs.hop_node_feat is not None:
            # window-fetched features (contiguous HBM streams); only the
            # B query rows of hop 0 are row-gathered. In fused mode the
            # last hop's features are NOT materialized (kernel-fetched).
            dn = tables.node_dim
            feats = [tables.node[flat_ids[0]]] + [
                nf.reshape(-1, dn) for nf in inputs.hop_node_feat
            ]
        else:
            ids_needed = flat_ids[: L] if fused else flat_ids
            feats = [tables.node[ids] for ids in ids_needed]
        base_feats = list(feats)  # merge-layer side input (TGAT.py:134)

        for l in range(1, L + 1):
            new_feats = []
            for h in range(0, L - l + 1):
                m = flat_ids[h].shape[0]
                kk = flat_ids[h + 1].shape[0] // m
                q_feat = feats[h]  # (m, Dn)
                nbr_ts = flat_ts[h + 1].reshape(m, kk)
                # exact integer delta, then float32 — matches the reference's
                # float64-numpy subtraction cast to float32 (TGAT.py:116-119)
                dt = (flat_ts[h][:, None] - nbr_ts).astype(jnp.float32)
                phi_0 = time_enc(jnp.zeros((m, 1), dtype=jnp.float32))[:, 0, :]
                mask = inputs.hop_mask[h].reshape(m, kk)
                if l == 1 and fused:
                    out, _ = convs[0](
                        q_feat, phi_0, None, None, None, mask, train=train,
                        window=(
                            inputs.hop_win_start[h].reshape(-1), dt,
                            inputs.feat_table,
                            tables.node_dim + tables.edge_dim,
                            time_enc.weights(),
                        ),
                    )
                elif l == 1 and self.use_gathered_kernel:
                    # layer-1 kv rows are RAW feature rows -> eligible for
                    # the post-gather fused kernel (no feature gradient);
                    # node/edge slabs stay separate — the kernel concats
                    # in VMEM, never in HBM
                    if inputs.hop_edge_feat is not None:
                        edge_flat = inputs.hop_edge_feat[h].reshape(
                            m * kk, -1
                        )
                    else:
                        edge_flat = tables.edge[inputs.hop_eids[h].reshape(-1)]
                    out, _ = convs[0](
                        q_feat, phi_0, None, None, None, mask, train=train,
                        gathered=(feats[h + 1], edge_flat, dt,
                                  time_enc.weights()),
                    )
                else:
                    kv_feat = feats[h + 1].reshape(m, kk, -1)
                    if inputs.hop_edge_feat is not None:
                        edge_feat = inputs.hop_edge_feat[h].reshape(m, kk, -1)
                    else:
                        edge_feat = tables.edge[inputs.hop_eids[h].reshape(m, kk)]
                    if self.use_phi_fusion:
                        out, _ = convs[l - 1](
                            q_feat, phi_0, kv_feat, None, edge_feat, mask,
                            train=train,
                            time_fused=(dt, time_enc.weights()),
                        )
                    else:
                        phi_dt = time_enc(dt)  # (m, kk, Dt)
                        out, _ = convs[l - 1](
                            q_feat, phi_0, kv_feat, phi_dt, edge_feat, mask,
                            train=train,
                        )
                out = merges[l - 1](out, base_feats[h])
                new_feats.append(out)
            feats = new_feats
        return feats[0].reshape(b, -1)


@dataclasses.dataclass
class TGAT:
    """Backbone adapter: sampling + apply for TGATNet."""

    num_neighbors: int = 20
    num_layers: int = 2
    num_heads: int = 2
    dropout: float = 0.1
    time_feat_dim: int = 100
    # "auto" resolves to bfloat16 on TPU, float32 elsewhere (round 5):
    # a measured 1.17x at the shipped operating point (12.05 -> 10.27
    # ms/step bracketed A/B; consistent with the r1/r2 readings of
    # 1.11-1.14x that were never shipped), end-metric neutral on-chip
    # (8-epoch calibration, 5 seeds/side: f32 0.8675+-0.0020 vs bf16
    # 0.8663+-0.0034 best val AP — the bf16 mean sits ON the torch
    # reference band mean of 0.8662+-0.0020 from CALIBRATION.json).
    # CPU parity tests resolve f32 and keep the torch-matching math.
    compute_dtype: str = "auto"
    sample_strategy: str = "recent"
    # fused Pallas attention kernel (ops/pallas/temporal_attention.py).
    # "auto" resolves to OFF: the kernel measured slower than XLA's
    # already-fused schedule at the shipped operating points (see the
    # kernel's MEASURED VERDICT); set True to force it (interpreted on CPU)
    use_fused_attention: bool | str = "auto"
    # fused window-gather attention kernel for the layer-1 fan-out
    # (ops/pallas/window_attention.py): kv feature rows DMA'd straight
    # from csr.feat_entry into VMEM, Phi(dt) computed on-chip. "auto"
    # resolves to ON whenever the 'recent' strategy + entry table are
    # available (requires wants_entry_features)
    use_window_attention: bool | str = "auto"
    # post-gather fused attention kernel (ops/pallas/gathered_attention.py):
    # XLA keeps the row gather, the kernel fuses Phi/projection/softmax/
    # weighted-sum + backward for the layer-1 fan-out. "auto" resolves OFF:
    # MEASURED 17.92 ms/step (best config) vs 13.01 for the XLA path at the
    # TGAT operating point — see the kernel's MEASURED VERDICT
    use_gathered_attention: bool | str = "auto"
    # fused Phi(dt) @ W_phi K/V contribution (ops/pallas/phi_projection.py)
    # — "auto" resolves by measured verdict in the kernel header
    use_phi_fusion: bool | str = "auto"
    # split-input K/V projections (TemporalMultiHeadAttention.split_kv)
    use_split_kv: bool = False
    has_state: bool = False
    # ask the trainer for an entry-ordered feature table on the CSR
    # (csr.feat_entry). Default OFF — MEASURED at the shipped operating
    # point (B=200, K=20, L=2, fused scan): packed row gathers 12.86
    # ms/step vs 14.18 via entry-window row fetch vs 18.35 via the
    # window-DMA Pallas kernel (its per-row DMA issue overhead dominates;
    # see ops/pallas/window_attention.py). The round-1 vmap(dynamic_slice)
    # variant of this path was 33.2 ms/step — a silent 2.6x regression
    # that the per-op trace caught (scripts/trace_ops.py).
    wants_entry_features: bool = False
    # embeddings depend only on (node, time): the trainer may embed the
    # training triple [src, dst, neg_dst] and reuse src for neg_src
    # (the reference trains with neg_src = src, train_link_prediction.py:165)
    pair_independent: bool = True

    def __post_init__(self):
        fused = self.use_fused_attention
        if fused == "auto":
            fused = False  # XLA path measured faster (see kernel verdict)
        win = self.use_window_attention
        if win == "auto":
            win = self.sample_strategy == "recent" and self.wants_entry_features
        self._window_kernel = bool(win) and self.sample_strategy == "recent"
        ga = self.use_gathered_attention
        if ga == "auto":
            ga = False  # measured loss vs XLA (kernel's MEASURED VERDICT)
        self._gathered_kernel = bool(ga) and not self._window_kernel
        pf = self.use_phi_fusion
        if pf == "auto":
            pf = False  # measured 2.7x LOSS (phi_projection.py verdict)
        self._phi_fusion = (
            bool(pf) and not self._window_kernel and not self._gathered_kernel
        )
        cd = self.compute_dtype
        if cd == "auto":
            cd = "bfloat16" if jax.default_backend() == "tpu" else "float32"
        kwargs = dict(
            time_feat_dim=self.time_feat_dim,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            dropout=self.dropout,
            dtype=jnp.dtype(cd),
        )
        self.module = TGATNet(
            use_pallas=bool(fused), use_window_kernel=self._window_kernel,
            use_gathered_kernel=self._gathered_kernel,
            use_phi_fusion=self._phi_fusion, split_kv=self.use_split_kv,
            **kwargs,
        )
        # param init runs on the CPU backend (remote-compile workaround),
        # where neither Pallas kernel can lower; the XLA module has an
        # IDENTICAL parameter tree by construction, so init through it
        # (init() samples with fused=False so the inputs carry every hop)
        self._init_module = TGATNet(use_pallas=False, **kwargs)

    def sample(
        self, csr: TemporalCSR, ids: jnp.ndarray, ts: jnp.ndarray,
        key: jax.Array, fused: bool | None = None,
    ) -> TGATInputs:
        blocks, wins = sample_multi_hop(
            csr, ids, ts, self.num_neighbors, self.num_layers,
            self.sample_strategy, key, return_windows=True,
        )
        b = ids.shape[0]
        k = self.num_neighbors
        hop_node_feat = hop_edge_feat = hop_win_start = feat_table = None
        if fused is None:
            fused = self._window_kernel
        fused = fused and csr.feat_entry is not None
        if fused and wins is not None:
            # the attention kernel fetches the layer-1 kv windows itself:
            # clamp guard-offset starts once here; materialize features
            # only for hops 1..L-1 (q/base/merge inputs of upper layers)
            # guard pad is recoverable from the table shape (the builder
            # may widen it past the 512 default for long-window consumers;
            # layout [guard | entries | guard | node_rows])
            from ..graph.csr import feat_entry_guard_pad

            fe_pad = feat_entry_guard_pad(csr)
            # the +fe_pad guard-offset clamp below assumes windows of K
            # rows fit inside the pad region; for num_layers == 1
            # fetch_entry_windows (which asserts this) never runs, so
            # assert here before a larger K silently shifts windows
            assert k <= fe_pad, (
                f"num_neighbors={k} exceeds feat_entry guard pad {fe_pad}"
            )
            t_max = csr.feat_entry.shape[0] - k
            hop_win_start = tuple(
                jnp.clip(w + fe_pad, 0, t_max).astype(jnp.int32)
                for w in wins
            )
            feat_table = csr.feat_entry
        if csr.feat_entry is not None and wins is not None:
            # contiguous window fetch instead of per-row feature gathers
            # (see fetch_entry_windows); masked to the row-gather path's
            # exact values (id-0 rows are zero)
            dn = csr.feat_entry_node_dim
            de = csr.feat_entry_edge_dim
            node_fs, edge_fs = [], []
            pairs = list(zip(blocks, wins))
            if fused:
                pairs = pairs[:-1]  # last hop lives in-kernel only
            for blk, win in pairs:
                w = fetch_entry_windows(csr, win, k)
                w = jnp.where(blk.mask[..., None], w, 0.0)
                node_fs.append(w[..., :dn].reshape(b, -1, dn))
                # feat_entry's lane dim is zero-padded to the 128 tiling;
                # the edge features are columns [dn, dn+de)
                edge_fs.append(w[..., dn : dn + de].reshape(b, -1, de))
            hop_node_feat = tuple(node_fs)
            hop_edge_feat = tuple(edge_fs)
        return TGATInputs(
            hop_ids=(ids.astype(jnp.int32),)
            + tuple(blk.nbr.reshape(b, -1) for blk in blocks),
            hop_eids=tuple(blk.eid.reshape(b, -1) for blk in blocks),
            hop_ts=(ts.astype(jnp.int32),)
            + tuple(blk.ts.reshape(b, -1) for blk in blocks),
            hop_mask=tuple(blk.mask.reshape(b, -1) for blk in blocks),
            hop_node_feat=hop_node_feat,
            hop_edge_feat=hop_edge_feat,
            hop_win_start=hop_win_start,
            feat_table=feat_table,
        )


    def init(self, key: jax.Array, tables: FeatureTables, csr: TemporalCSR):
        ids = jnp.zeros((2,), jnp.int32)
        ts = jnp.zeros((2,), jnp.int32)
        inputs = self.sample(csr, ids, ts, jax.random.PRNGKey(0), fused=False)
        return self._init_module.init(key, tables, inputs)

    def init_state(self, tables: FeatureTables):
        return None

    def apply(
        self, params, tables, inputs, *, state=None, train=False, rngs=None
    ) -> jnp.ndarray:
        return self.module.apply(params, tables, inputs, train=train, rngs=rngs)
