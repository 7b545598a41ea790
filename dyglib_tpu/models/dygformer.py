"""DyGFormer: patched transformer over full first-hop histories with
neighbor co-occurrence encoding.

Behavioral parity target: models/DyGFormer.py:11-461.

Semantics preserved:
  * sequence = target node first (edge id 0, t = interaction time) followed
    by the most recent max_input_sequence_length - 1 interactions in
    chronological order, zero-padded at the END (DyGFormer.py:196-245);
  * time features Phi(t - t_i) with padded rows zeroed (DyGFormer.py:247-268);
  * NeighborCooccurrenceEncoder: per entry, its occurrence count in the own
    sequence and in the paired sequence, each count MLP-encoded
    (1 -> d -> ReLU -> d) and summed over the two channels; padded rows
    zeroed (DyGFormer.py:320-415) — the reference's np.unique + dict loops
    become one batched equality-matmul;
  * patching: reshape to (B, P, patch_size * feat_dim) per channel,
    4 channels (node/edge/time/co-occurrence) each projected to
    channel_embedding_dim and stacked (DyGFormer.py:270-306, 146-174);
  * src and dst patch sequences CONCATENATED and jointly attended by
    num_layers PRE-LN transformer blocks (norm-before-attention, exact-erf
    GELU FFN, NO padding mask — distinct from the shared post-LN encoder;
    DyGFormer.py:418-461), then split, mean-pooled, Linear to node_feat_dim.

TPU-native deviation (documented): the reference pads each batch to its own
max history length rounded up to the patch size (dynamic shapes,
DyGFormer.py:219-226); here the sequence length is the STATIC
round_up(max_input_sequence_length, patch_size). Padded positions carry
zero features in both implementations and are unmasked in both; only the
number of zero-feature pad tokens differs, and end-metric parity is
validated in tests against the reference run end-to-end.

Like TCL, DyGFormer is a PAIRED model: the quad batch is reinterpreted as
2B (left, right) pairs inside apply.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph.csr import TemporalCSR
from ..graph.sampler import window_bounds
from ..nn.modules import (
    LN_EPS,
    RawLinearParams,
    TimeEncoder,
    TorchLinear,
    uniform_init,
    xavier_uniform_init,
)
from .base import FeatureTables


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class DyGFormerInputs(NamedTuple):
    seq_ids: jnp.ndarray  # (4B, Lp) int32 — target first, then chronological
    seq_eids: jnp.ndarray  # (4B, Lp)
    seq_ts: jnp.ndarray  # (4B, Lp) int32
    query_ts: jnp.ndarray  # (4B,) int32
    # optional prefetched [node_feat || edge_feat] rows for the FULL
    # sequence (target row 0 included), (4B, Lp, >=Dn+De) f32, pads zeroed
    # via index redirection to a guard row. Built by DyGFormer.sample from
    # csr.feat_entry in ONE row gather — half the latency-bound row count
    # of the two per-table gathers it replaces (row gathers cost ~7 ns/row
    # regardless of width — BASELINE.md round 1) and no masking/concat
    # passes. None falls back to per-table gathers.
    seq_feat: jnp.ndarray | None = None


def _bf16_mask_dropout(mod, x, rate, train):
    """Experimental dropout variant (round 5): multiplicative bf16 mask.

    flax's nn.Dropout saves a residual for backward that XLA chooses to
    materialize as the u32 rng bits (4 B/elem VMEM spills measured at
    0.2 ms/step in the flagship trace); this variant multiplies by a
    bf16 0-or-1/keep mask so the saved operand is 2 B/elem. Same
    distribution (keep w.p. 1-rate), different draw stream; the 1/keep
    scale is bf16-rounded (~0.2% — far below dropout's own noise).
    Gated by DyGFormer(dropout_impl="bf16mask"); default stays flax.
    """
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    u = jax.random.uniform(mod.make_rng("dropout"), x.shape)
    m = (u < keep).astype(jnp.bfloat16) * jnp.bfloat16(1.0 / keep)
    return x * m


class PreLNTransformerEncoder(nn.Module):
    """DyGFormer's local pre-LN block (DyGFormer.py:418-461): norm -> MHA ->
    residual; norm -> GELU FFN -> residual. No padding mask.

    ``seq_axis``: mesh axis name for Ulysses-style sequence sharding
    (SURVEY §2.6/§5 "design for it at the attention-kernel interface").
    When set and a mesh is active, tokens are sharded over that axis for
    the projections/LN/FFN and the attention itself runs HEAD-sharded over
    the same axis — the layout flip is expressed as sharding constraints
    and XLA inserts the two all_to_alls over ICI (the scaling-book recipe:
    annotate, don't hand-schedule). Requires num_heads and the token count
    to be divisible by the axis size. Numerically identical to the
    unsharded path (tests/test_seq_sharded_attention.py)."""

    attention_dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    seq_axis: str | None = None
    # tanh-approximate GELU: the exact-erf GELU's polynomial evaluation,
    # fused by XLA into the FFN dots, costs 2.1x on the whole FFN fwd+bwd
    # at the flagship operating point (926 vs 444 us/step measured on v5e,
    # (25600, 200)x(200, 800) FFN); the tanh form is the standard
    # GPT-2/BERT approximation (<=3e-3 abs activation difference,
    # end-metric neutral). Reference math (nn.GELU() exact erf,
    # DyGFormer.py:445) is kept for parity tests via False.
    gelu_approximate: bool = False
    # 128-lane-aligned attention heads (math-exact; see
    # TorchLinear.out_group_pad): head_dim d/num_heads = 100 is
    # lane-misaligned, making every (b,t,H,hd)<->(b,t,d) reshape a lane
    # repack. Padded q/k/v project into zero-padded 128-wide head slots;
    # out_proj absorbs the padding with zero kernel rows.
    pad_heads: bool = False
    dropout_impl: str = "flax"  # or "bf16mask" (see _bf16_mask_dropout)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.attention_dim
        hd = d // self.num_heads
        hdp = ((hd + 127) // 128) * 128 if self.pad_heads else hd
        b, t, _ = x.shape
        if self.seq_axis is not None and not self.is_initializing():
            # no-op during init: param init runs on the single-device CPU
            # backend (remote-compile workaround) where the mesh axes
            # don't exist; constraints only matter for the real step
            from jax.sharding import PartitionSpec as P

            shard = lambda arr, spec: jax.lax.with_sharding_constraint(
                arr, P(*spec)
            )
        else:
            shard = lambda arr, spec: arr
        sa = self.seq_axis
        # torch nn.MultiheadAttention init: xavier-uniform in_proj with
        # zero bias, default-Linear out_proj kernel with zero bias
        ogp = (self.num_heads, hd, hdp) if hdp != hd else None
        attn_proj = lambda name: TorchLinear(
            d, dtype=self.dtype, name=name,
            kernel_init_override=xavier_uniform_init, zero_bias=True,
            out_group_pad=ogp,
        )
        dense = lambda dd, name: TorchLinear(dd, dtype=self.dtype, name=name)
        if self.dropout_impl == "bf16mask":
            drop = lambda y: _bf16_mask_dropout(self, y, self.dropout, train)
        else:
            drop = lambda y: nn.Dropout(
                self.dropout, deterministic=not train
            )(y)
        x = shard(x, (None, sa, None))  # token-sharded residual stream
        h = nn.LayerNorm(epsilon=LN_EPS, name="norm1")(x).astype(self.dtype)
        q = attn_proj("q_proj")(h).reshape(b, t, self.num_heads, hdp)
        k = attn_proj("k_proj")(h).reshape(b, t, self.num_heads, hdp)
        v = attn_proj("v_proj")(h).reshape(b, t, self.num_heads, hdp)
        # Ulysses layout flip: tokens -> heads (XLA emits an all_to_all)
        q = shard(q, (None, None, sa, None))
        k = shard(k, (None, None, sa, None))
        v = shard(v, (None, None, sa, None))
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) / jnp.sqrt(
            hd
        ).astype(jnp.float32)
        attn = shard(attn, (None, sa, None, None))  # head-sharded scores
        scores = drop(nn.softmax(attn, axis=-1))
        hidden = jnp.einsum(
            "bhqk,bkhd->bqhd", scores.astype(self.dtype), v
        )
        # flip back: heads -> tokens (second all_to_all)
        hidden = shard(hidden, (None, sa, None, None)).reshape(
            b, t, self.num_heads * hdp
        )
        hidden = TorchLinear(
            d, dtype=self.dtype, name="out_proj", zero_bias=True,
            in_group_pad=(self.num_heads, hd, hdp) if hdp != hd else None,
        )(hidden)
        x = x + drop(hidden.astype(jnp.float32))
        h = nn.LayerNorm(epsilon=LN_EPS, name="norm2")(x).astype(self.dtype)
        h = dense(4 * d, "ffn1")(h)
        h = drop(nn.gelu(h, approximate=self.gelu_approximate))
        h = dense(d, "ffn2")(h)
        return x + drop(h.astype(jnp.float32))


class _Patched:
    """Apply ``mod`` on the patch-flattened view of the input."""

    def __init__(self, mod, patches):
        self.mod, self.patches = mod, patches

    def __call__(self, x):
        return self.mod(self.patches(x))


class PatchProjection(nn.Module):
    """Channel projection with the patch flatten folded INTO the dot.

    ``TorchLinear(ced)(patches(x))`` first materializes the
    (M, P, patch*D) repack — at CanParl (patch 64, D 172) an 11008-lane
    relayout costing ~7 ms/step in fwd+bwd reshapes (trace, BASELINE.md
    round 4). The same math is a free sublane split (M, Lp, D) ->
    (M, P, patch, D) followed by a dot_general contracting (patch, D)
    against the kernel viewed (patch, D, ced) — no repack exists.
    Param tree and init are IDENTICAL to TorchLinear(ced) on the
    flattened input (kernel (patch*D, ced) row-major over (patch, D))."""

    features: int
    patch_size: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        m, lp, dfeat = x.shape
        k = self.patch_size
        p = lp // k
        fan_in = k * dfeat
        bound = float(fan_in) ** -0.5
        kernel = self.param("kernel", uniform_init(bound), (fan_in, self.features))
        bias = self.param("bias", uniform_init(bound), (self.features,))
        dt = self.dtype or x.dtype
        y = jax.lax.dot_general(
            x.reshape(m, p, k, dfeat).astype(dt),
            kernel.reshape(k, dfeat, self.features).astype(dt),
            (((2, 3), (0, 1)), ((), ())),
        )
        return y + bias.astype(dt)


class DyGFormerNet(nn.Module):
    time_feat_dim: int = 100
    channel_embedding_dim: int = 50
    patch_size: int = 1
    num_layers: int = 2
    num_heads: int = 2
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32  # computation dtype (params stay f32)
    seq_axis: str | None = None  # Ulysses sequence sharding (see encoder)
    gelu_approximate: bool = False  # see PreLNTransformerEncoder
    pad_heads: bool = False  # see PreLNTransformerEncoder
    dropout_impl: str = "flax"  # see _bf16_mask_dropout
    fold_patch_proj: bool = False  # see PatchProjection
    # fused patch-projection kernel for the frozen node/edge channels
    # (ops/pallas/patch_projection.py); only meaningful at patch_size > 1
    use_patch_kernel: bool = False
    # rematerialize each transformer layer in backward: the flagship step
    # is HBM-bound on the (M, 4d) f32 FFN activations (trace: FFN dots at
    # the ~819 GB/s roofline, 27-66 TF/s) — recomputing them costs idle
    # MXU cycles and saves the fwd-write + bwd-read round trip
    remat: bool = False
    # fused time-channel kernel (ops/pallas/time_channel.py): Phi(dt) is
    # computed per patch slot IN VMEM and contracted immediately — the
    # (M, L, Dt) masked time-feature tensor never exists in HBM. Same
    # param tree as the plain path (proj_time/{kernel,bias}).
    use_time_kernel: bool = False

    @nn.compact
    def __call__(
        self, tables: FeatureTables, inputs: DyGFormerInputs, *,
        train: bool = False, triple: bool = False,
    ) -> jnp.ndarray:
        ced = self.channel_embedding_dim
        m, lp = inputs.seq_ids.shape
        p = lp // self.patch_size
        valid = inputs.seq_ids != 0  # (M, Lp)

        # row pairing. Quad [src||dst||neg_src||neg_dst]: left = [src,
        # neg_src], right = [dst, neg_dst]. TRIPLE [src||dst||neg_dst]
        # (training, where the reference's neg_src = src and 'recent'
        # sampling is deterministic, so the neg_src rows' sequences are
        # bit-identical to src's): the src rows' per-row channels are
        # computed ONCE and indexed into both pairs — 25% less
        # gather/Phi/projection work on the dominant per-entry stage.
        if triple:
            b = m // 3
            li = jnp.concatenate([jnp.arange(b), jnp.arange(b)])
            ri = jnp.concatenate([jnp.arange(b, 2 * b), jnp.arange(2 * b, 3 * b)])
        else:
            b = m // 4
            li = jnp.concatenate([jnp.arange(b), jnp.arange(2 * b, 3 * b)])
            ri = jnp.concatenate([jnp.arange(b, 2 * b), jnp.arange(3 * b, 4 * b)])

        # ---- neighbor co-occurrence counts via batched equality, computed
        # and kept in PAIR space (2B) — co-occurrence is the one channel
        # that differs per partner
        ids_l, ids_r = inputs.seq_ids[li], inputs.seq_ids[ri]  # (2B, Lp)
        if triple:
            # ids_l's two halves are the SAME src rows: compute the src
            # self-counts ONCE over B rows and reuse for both pairs —
            # drops 1 of the ~8 (2B, Lp, Lp) VPU compare/sum passes the
            # co-occurrence stage costs (6.0 ms of the 46 ms CanParl
            # step, BASELINE.md round 4)
            ids_s = inputs.seq_ids[:b]
            eq_ss = (ids_s[:, :, None] == ids_s[:, None, :]).astype(
                jnp.float32
            )
            cnt_ll = jnp.tile(eq_ss.sum(-1), (2, 1))  # (2B, Lp)
        else:
            eq_ll = (ids_l[:, :, None] == ids_l[:, None, :]).astype(
                jnp.float32
            )
            cnt_ll = eq_ll.sum(-1)
        eq_lr = (ids_l[:, :, None] == ids_r[:, None, :]).astype(jnp.float32)
        eq_rr = (ids_r[:, :, None] == ids_r[:, None, :]).astype(jnp.float32)
        cnt_l = jnp.stack([cnt_ll, eq_lr.sum(-1)], axis=-1)  # (2B,Lp,2)
        cnt_r = jnp.stack(
            [eq_lr.transpose(0, 2, 1).sum(-1), eq_rr.sum(-1)], axis=-1
        )
        cnt_l = jnp.where(valid[li][..., None], cnt_l, 0.0)
        cnt_r = jnp.where(valid[ri][..., None], cnt_r, 0.0)

        # count -> feature: MLP per channel then sum (DyGFormer.py:396-409)
        co_fc1 = TorchLinear(ced, name="co_occurrence_fc1")
        co_fc2 = TorchLinear(ced, name="co_occurrence_fc2")
        co = lambda cnt: co_fc2(nn.relu(co_fc1(cnt[..., None]))).sum(axis=2)
        co_l, co_r = co(cnt_l), co(cnt_r)  # (2B, Lp, ced)

        # ---- raw features (per ROW — M rows, shared across pairs)
        node_feat = edge_feat = None
        if inputs.seq_feat is None:
            node_feat = tables.node[inputs.seq_ids]  # (M, Lp, Dn)
            edge_feat = tables.edge[inputs.seq_eids]
        time_enc = TimeEncoder(self.time_feat_dim, name="time_encoder")
        dt = (inputs.query_ts[:, None] - inputs.seq_ts).astype(jnp.float32)

        # ---- patching + channel projections
        cast = lambda x: x.astype(self.dtype)
        if self.patch_size == 1 or not self.fold_patch_proj:
            # patch flatten materialized (no-op at patch 1)
            patches = lambda x: x.reshape(
                x.shape[0], p, self.patch_size * x.shape[-1]
            )
            chan_mod = lambda name: _Patched(
                TorchLinear(ced, dtype=self.dtype, name=name), patches
            )
        else:
            # fold the patch flatten into the dot (no (M,P,patch*D) repack)
            chan_mod = lambda name: PatchProjection(
                ced, self.patch_size, dtype=self.dtype, name=name
            )
        if self.use_patch_kernel and self.patch_size > 1:
            # fused patch-projection kernel for the FROZEN channels
            # (ops/pallas/patch_projection.py): the (M, P, patch*D) repack
            # never exists in HBM; no input cotangent (raw table rows)
            from ..ops.pallas.patch_projection import patch_projection

            def frozen_chan(name, x):
                w, bias = RawLinearParams(
                    self.patch_size * x.shape[-1], ced, name=name
                )()
                return patch_projection(
                    jax.lax.stop_gradient(x.astype(jnp.float32)), w, bias,
                    self.patch_size,
                )
        else:
            frozen_chan = lambda name, x: chan_mod(name)(cast(x))
        if self.use_time_kernel:
            from ..ops.pallas.time_channel import time_channel_projection

            tw, tb = time_enc.weights()
            wt, bt = RawLinearParams(
                self.patch_size * self.time_feat_dim, ced, name="proj_time"
            )()
            time_ch = time_channel_projection(
                dt, valid.astype(jnp.float32), tw.reshape(-1), tb, wt, bt,
                self.patch_size,
            )
        else:
            time_feat = jnp.where(valid[..., None], time_enc(dt), 0.0)
            time_ch = chan_mod("proj_time")(cast(time_feat))
        if inputs.seq_feat is not None:
            # PACKED projection of the prefetched [node || edge] rows: one
            # patch flatten of the packed (M, Lp, W) tensor and ONE matmul
            # against zero-scattered packed weights computes both frozen
            # channels. Lane-slicing the packed tensor into separate
            # node/edge views first measured 5.5 ms/step of pure [slice]
            # at CanParl (round-5 trace) — the slices materialize; padding
            # the WEIGHT rows instead moves the cost into the matmul's K
            # dim (24576 vs 11008: +0.5 ms of bf16 FLOPs) and deletes the
            # slices and one of the two flattens.
            dn, de = tables.node.shape[1], tables.edge.shape[1]
            w_full = inputs.seq_feat.shape[-1]
            ps = self.patch_size
            wn, bn = RawLinearParams(ps * dn, ced, name="proj_node")()
            we, be = RawLinearParams(ps * de, ced, name="proj_edge")()
            # bf16 operands are math-IDENTICAL to the f32 formulation here:
            # XLA executes f32 matmuls as single-pass bf16 with f32
            # accumulation anyway (BASELINE.md round-1 roofline note), so
            # casting at the flatten only halves the flattened tensor's
            # HBM bytes, it does not change the MXU inputs
            mm_dtype = (
                jnp.bfloat16 if jnp.dtype(self.dtype) == jnp.float32
                else self.dtype
            )
            wboth = (
                jnp.zeros((ps, w_full, 2 * ced), mm_dtype)
                .at[:, :dn, :ced].set(
                    wn.astype(mm_dtype).reshape(ps, dn, ced)
                )
                .at[:, dn : dn + de, ced:].set(
                    we.astype(mm_dtype).reshape(ps, de, ced)
                )
                .reshape(ps * w_full, 2 * ced)
            )
            flat = inputs.seq_feat.astype(mm_dtype).reshape(m, p, ps * w_full)
            both = jnp.einsum(
                "mpk,kc->mpc", flat, wboth,
                preferred_element_type=jnp.float32,
            )
            node_ch = both[..., :ced] + bn
            edge_ch = both[..., ced:] + be
        else:
            node_ch = frozen_chan("proj_node", node_feat)
            edge_ch = frozen_chan("proj_edge", edge_feat)
        row_ch = [node_ch, edge_ch, time_ch]  # each (M, P, ced)
        co_mod = chan_mod("proj_co_occurrence")
        co_pl = co_mod(cast(co_l))  # (2B, P, ced)
        co_pr = co_mod(cast(co_r))

        # assemble pair-space token stacks directly (no quad round trip)
        xl = jnp.stack(
            [c[li] for c in row_ch] + [co_pl], axis=2
        ).reshape(2 * b, p, 4 * ced)
        xr = jnp.stack(
            [c[ri] for c in row_ch] + [co_pr], axis=2
        ).reshape(2 * b, p, 4 * ced)

        # ---- joint src||dst attention per pair
        joint = jnp.concatenate([xl, xr], axis=1).astype(jnp.float32)
        enc_cls = PreLNTransformerEncoder
        if self.remat:
            # inner fn args: (module, x, train) -> train is static index 2.
            # dots_saveable: keep matmul outputs, recompute elementwise
            # (GELU/dropout/LN) in backward — the saved HBM round trips are
            # the activation tensors, not the dot outputs
            enc_cls = nn.remat(
                PreLNTransformerEncoder, static_argnums=(2,),
                policy=jax.checkpoint_policies.dots_saveable,
            )
        for i in range(self.num_layers):
            joint = enc_cls(
                4 * ced, self.num_heads, self.dropout, dtype=self.dtype,
                seq_axis=self.seq_axis,
                gelu_approximate=self.gelu_approximate,
                pad_heads=self.pad_heads,
                dropout_impl=self.dropout_impl,
                name=f"transformer_{i}",
            )(joint, train)
        out_l = joint[:, :p, :].mean(axis=1)
        out_r = joint[:, p:, :].mean(axis=1)
        output = TorchLinear(tables.node_dim, name="output_layer")
        emb_l, emb_r = output(out_l), output(out_r)
        return jnp.concatenate(
            [emb_l[:b], emb_r[:b], emb_l[b:], emb_r[b:]], axis=0
        )


@dataclasses.dataclass
class DyGFormer:
    """Backbone adapter for DyGFormerNet (paired model)."""

    max_input_sequence_length: int = 32
    patch_size: int = 1
    channel_embedding_dim: int = 50
    num_layers: int = 2
    num_heads: int = 2
    dropout: float = 0.1
    time_feat_dim: int = 100
    compute_dtype: str = "float32"  # "bfloat16" for single-pass MXU compute
    has_state: bool = False
    pair_independent: bool = False  # co-occurrence encoder is pair-aware
    # pair-AWARE but with deterministic ('recent') sampling: at train time
    # the reference's neg_src = src makes the neg_src rows' sequences
    # bit-identical to src's, so the trainer may send the TRIPLE
    # [src||dst||neg_dst] and the net reuses src's per-row channels for
    # both pairs (triple=True) — exact, not approximate
    triple_expand: bool = True
    sample_strategy: str = "recent"  # full-history truncation is recency-based
    # mesh axis name for Ulysses sequence sharding of the joint patch-token
    # attention (PreLNTransformerEncoder.seq_axis). None = unsharded. Use
    # with a mesh whose named axis divides num_heads AND the joint token
    # count 2 * seq_len / patch_size (CanParl 2048/64: 64 joint tokens).
    sequence_axis: str | None = None
    # fused time-channel Pallas kernel (see DyGFormerNet.use_time_kernel).
    # "auto" resolves ON at every operating point — MEASURED: CanParl
    # (2048/64) 1.12x, lastfm (512/16) 1.06x, wikipedia (32/1) ~1.04x
    # (8.40-8.61 vs 8.74-8.87 ms/step back-to-back; BASELINE.md round 3)
    use_time_kernel: bool | str = "auto"
    # per-layer transformer remat (see DyGFormerNet.remat)
    remat: bool = False
    # 128-lane-aligned attention heads (see PreLNTransformerEncoder)
    pad_heads: bool = False
    # dropout implementation: "flax" (reference nn.Dropout semantics) or
    # "bf16mask" (experimental — see _bf16_mask_dropout)
    dropout_impl: str = "flax"
    # fold the patch flatten into the channel-projection dot (see
    # PatchProjection; only meaningful at patch_size > 1)
    fold_patch_proj: bool = False
    # fused patch-projection kernel for the frozen node/edge channels —
    # "auto" resolves OFF: measured 59.5+ vs 39.5 ms/step at CanParl
    # (see the kernel's MEASURED VERDICT); kept as a parity-tested variant
    use_patch_kernel: bool | str = "auto"
    # prefetch neighbor features as contiguous csr.feat_entry windows —
    # NEGATIVE VERDICT (round 5), "auto" resolves OFF. Three formulations
    # measured at CanParl (2048/64, B=200, same-session interleaved;
    # baseline gather path 38.2-38.9 ms/step):
    #   * wide-row gather over the packed entry table: 60 ms (384-lane
    #     rows gather ~3x slower per row than 172-lane — the r1
    #     "width-independent" finding breaks beyond 2 lane tiles);
    #   * masked+concat single-gather draft: 56 ms (two extra full passes
    #     over the 1.9 GB tensor);
    #   * slab-layout DMA kernel (ops/pallas/window_fetch.py), double-
    #     buffered + packed-weight projection: 40.2-40.6 ms. The kernel
    #     itself beats the gather it replaces (6.5 vs 10.3 ms in-trace)
    #     but the surplus leaks into scan-schedule bubbles ('while'
    #     self-time 1.6 -> 4.5 ms) and the packed tensor's extra flatten
    #     bytes — the fetch is no longer the binding constraint once it
    #     is under ~7 ms.
    # True/"gather" remain available for measurement; parity is bitwise
    # (tests/test_window_fetch.py).
    use_entry_fetch: bool | str = "auto"
    # tanh-approximate GELU in the local transformer FFN (see
    # PreLNTransformerEncoder.gelu_approximate): "auto" resolves ON on the
    # TPU backend (measured 2.1x on the FFN fwd+bwd; <=3e-3 activation
    # delta, DyGFormer calibration band unchanged), OFF elsewhere so CPU
    # parity tests exercise the reference's exact-erf math.
    gelu_approximate: bool | str = "auto"

    @property
    def seq_len(self) -> int:
        return _round_up(self.max_input_sequence_length, self.patch_size)

    @property
    def wants_entry_features(self) -> bool:
        """Ask the trainer to build csr.feat_entry (see use_entry_fetch)."""
        if self.use_entry_fetch == "auto":
            return False  # measured negative at every operating point
        return bool(self.use_entry_fetch)

    @property
    def entry_window_rows(self) -> int:
        """Guard-pad rows the entry table needs for this model's windows."""
        return self.seq_len

    @property
    def entry_feature_layout(self) -> str:
        """"slabs" for the window-DMA kernel; "packed" only for the
        negative-verdict gather formulation (kept for measurement)."""
        return "packed" if self.use_entry_fetch == "gather" else "slabs"

    @property
    def bucket_candidates(self) -> tuple[int, ...]:
        """Patch-aligned sequence-length buckets {start, 2*start, ..., seq_len}.

        The reference pads each batch to its own max history length rounded
        up to the patch size (DyGFormer.py:219-226) — dynamic shapes. The
        TPU-native equivalent is a small set of static buckets: the trainer
        picks the smallest bucket covering the batch's longest history and
        dispatches the jit specialization for it, so early-epoch batches
        (short histories) skip most of the compute. Since DyGFormerNet's
        parameters are sequence-length independent (patch projections see
        patch_size*feat_dim), every bucket shares one parameter pytree, and
        a bucket-B forward is bit-identical to a maxlen-B model's forward.
        """
        start = _round_up(max(8, self.patch_size), self.patch_size)
        out = []
        c = start
        while c < self.seq_len:
            out.append(c)
            c *= 2
        out.append(self.seq_len)
        return tuple(out)

    def __post_init__(self):
        tk = self.use_time_kernel
        if tk == "auto":
            # measured win at every TPU operating point (BASELINE.md r3);
            # on other backends the Pallas kernel runs in interpret mode
            # (slow, bf16 matmul math) — resolve OFF there. Explicit
            # use_time_kernel=True stays available for parity testing.
            import jax

            tk = jax.default_backend() == "tpu"
        ga = self.gelu_approximate
        if ga == "auto":
            import jax

            ga = jax.default_backend() == "tpu"
        pk = self.use_patch_kernel
        if pk == "auto":
            pk = False  # measured loss vs XLA (kernel's MEASURED VERDICT)
        kwargs = dict(
            time_feat_dim=self.time_feat_dim,
            channel_embedding_dim=self.channel_embedding_dim,
            patch_size=self.patch_size,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            dropout=self.dropout,
            dtype=jnp.dtype(self.compute_dtype),
            seq_axis=self.sequence_axis,
            gelu_approximate=bool(ga),
            remat=self.remat,
            pad_heads=self.pad_heads,
            dropout_impl=self.dropout_impl,
            fold_patch_proj=self.fold_patch_proj,
        )
        self.module = DyGFormerNet(
            use_time_kernel=bool(tk), use_patch_kernel=bool(pk), **kwargs
        )
        # init runs on the CPU backend where the kernel runs interpreted
        # (slow at big shapes); the plain module has an IDENTICAL param
        # tree by construction (RawLinearParams mirrors TorchLinear)
        self._init_module = DyGFormerNet(use_time_kernel=False, **kwargs)

    def sample(
        self,
        csr: TemporalCSR,
        ids: jnp.ndarray,
        ts: jnp.ndarray,
        key: jax.Array,
        seq_len: int | None = None,
    ) -> DyGFormerInputs:
        """Most recent maxlen-1 interactions, LEFT-aligned after the target
        (reference pad_sequences layout, DyGFormer.py:228-242).

        ``seq_len`` (static) overrides the padded sequence length with a
        smaller bucket from ``bucket_candidates``; histories are truncated
        to the bucket's most recent seq_len-1 entries, exactly what a
        maxlen=seq_len model would see.
        """
        total = self.seq_len if seq_len is None else seq_len
        ids = ids.astype(jnp.int32)
        ts = ts.astype(jnp.int32)
        k = min(self.max_input_sequence_length, total) - 1
        # the most recent k interactions LEFT-ALIGNED in one gather: the
        # recent window is the contiguous CSR range [max(lo, hi-k), hi), so
        # output entry j reads flat index max(lo, hi-k)+j while j < count
        lo, hi = window_bounds(csr, ids, ts)
        start = jnp.maximum(lo, hi - k)
        j = jnp.arange(k, dtype=jnp.int32)[None, :]
        idx = start[:, None] + j
        valid = idx < hi[:, None]
        safe = jnp.clip(idx, 0, csr.num_entries - 1)
        if csr.pack is not None:  # one packed row gather (see TemporalCSR.pack)
            rows = csr.pack[safe]
            nbr = jnp.where(valid, rows[..., 0], 0)
            eid = jnp.where(valid, rows[..., 1], 0)
            tsn = jnp.where(valid, rows[..., 2], 0)
        else:
            nbr = jnp.where(valid, csr.nbr[safe], 0)
            eid = jnp.where(valid, csr.eid[safe], 0)
            tsn = jnp.where(valid, csr.ts[safe], 0)

        seq_feat = None
        if self.wants_entry_features and (
            csr.feat_entry is not None or csr.feat_entry_slabs is not None
        ):
            from ..graph.csr import feat_entry_guard_pad

            fe_pad = feat_entry_guard_pad(csr)
            assert k <= fe_pad, (
                f"window k={k} exceeds feat_entry guard pad {fe_pad}"
            )
            node_base = 2 * fe_pad + csr.num_entries
            if self.use_entry_fetch == "gather":
                table = csr.feat_entry
                # NEGATIVE VERDICT, kept for measurement (round 5): one
                # row gather for the whole tensor — position 0 reads the
                # per-node block, invalid positions index-redirect to
                # guard row 0. MEASURED 60 vs 38.4 ms/step at CanParl:
                # 384-lane row gathers cost ~3x the 172-lane rate, so
                # halving the row count still loses (the r1
                # "width-independent" gather finding breaks at 3 tiles).
                idx_tgt = node_base + ids[:, None]
                idx_nbr = jnp.where(valid, idx + fe_pad, 0)
                full_idx = jnp.concatenate([idx_tgt, idx_nbr], axis=1)
                if total - 1 - k > 0:
                    zpad = jnp.zeros(
                        (full_idx.shape[0], total - 1 - k), jnp.int32
                    )
                    full_idx = jnp.concatenate([full_idx, zpad], axis=1)
                seq_feat = table[full_idx]  # (M, Lp, width)
            else:
                # DMA block-copy kernel: ~M*S*(Lp/tile) block DMAs instead
                # of M*Lp latency-bound row gathers (the windows are
                # contiguous entry-table ranges; slab layout — see
                # ops/pallas/window_fetch.py)
                from ..ops.pallas.window_fetch import fetch_sequence_features

                # interpret off-TPU — including under init_params'
                # `with jax.default_device(cpu)` scope, where the global
                # default_backend() still says "tpu" but lowering is CPU
                dd = jax.config.jax_default_device
                platform = (
                    dd.platform if dd is not None else jax.default_backend()
                )
                seq_feat = fetch_sequence_features(
                    csr.feat_entry_slabs,
                    node_base + ids,
                    start + fe_pad,
                    hi - start,
                    total,
                    interpret=platform != "tpu",
                )

        pad_cols = total - 1 - k
        if pad_cols > 0:
            z = jnp.zeros(nbr.shape[:1] + (pad_cols,), nbr.dtype)
            nbr = jnp.concatenate([nbr, z], axis=1)
            eid = jnp.concatenate([eid, z], axis=1)
            tsn = jnp.concatenate([tsn, z], axis=1)
        zeros = jnp.zeros_like(ids)[:, None]
        return DyGFormerInputs(
            seq_ids=jnp.concatenate([ids[:, None], nbr], axis=1),
            seq_eids=jnp.concatenate([zeros, eid], axis=1),
            seq_ts=jnp.concatenate([ts[:, None], tsn], axis=1),
            query_ts=ts,
            seq_feat=seq_feat,
        )

    def init(self, key: jax.Array, tables: FeatureTables, csr: TemporalCSR):
        ids = jnp.zeros((8,), jnp.int32)
        ts = jnp.zeros((8,), jnp.int32)
        inputs = self.sample(csr, ids, ts, jax.random.PRNGKey(0))
        return self._init_module.init(key, tables, inputs)

    def init_state(self, tables: FeatureTables):
        return None

    def apply(self, params, tables, inputs, *, state=None, train=False,
              rngs=None, triple=False):
        return self.module.apply(
            params, tables, inputs, train=train, triple=triple, rngs=rngs
        )
