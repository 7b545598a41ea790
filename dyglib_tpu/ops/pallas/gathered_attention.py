"""Pallas TPU kernel: post-gather fused temporal attention.

Second kernel iteration, designed from the window-DMA kernel's measured
verdict (BASELINE.md "Round 2"): per-row manual DMAs are issue-bound
(~5 us of descriptor work per 32-row program) and the 8-row DMA
alignment forces K_PAD=32 superset windows (1.6x FLOPs/bytes at K=20).
This kernel keeps the feature GATHER in XLA — a flat row gather is
latency-bound but predictable (~7 ns/row) and its output is consumed
exactly once — and fuses everything AFTER it:

    Phi(dt) = cos(dt*w + b) on-chip        (no (M, K, Dt) HBM tensor)
    concat [feat || phi]                   (no (M*K, 444) HBM tensor)
    K = kv @ Wk, V = kv @ Wv               (no (M*K, Dq) HBM tensors x2)
    masked softmax (pad logit -1e10) -> score dropout -> weighted sum

per BLK-row program, with the (BLK*K, D) feature slab arriving as ONE
auto-pipelined Mosaic block fetch (double-buffered by the pipeline, no
manual descriptors), at the native K. The backward recomputes in-kernel
(flash-attention-style) and accumulates dWk/dWv and the TimeEncoder's
dW/db across the sequential grid; no feature gradient exists (kv rows
are RAW features), so XLA holds only the gather output as a residual —
which it materialized anyway.

What the XLA path materializes in HBM for the same computation at the
TGAT operating point (B=200, K=20, L=2: 12,600 query rows, 252k kv
rows): Phi (101 MB), key+val (274 MB each way), their backward
re-reads, dkey/dval (274 MB), dPhi — ~1.5-2 GB/step of round trips this
kernel never issues.

Used by TGAT's layer-1 convolutions for EVERY feature path (plain row
gathers included — unlike the window-DMA kernel it does not need
csr.feat_entry). Reference hot loop: models/modules.py:99-206.

MEASURED VERDICT (round 3, TGAT operating point B=200, K=20, L=2, fused
32-step scan, same hour; scripts/profile_variants.py tgat_ga vs
tgat_noentry):

    | TGAT attention path                  | ms/step | edges/s |
    |--------------------------------------|---------|---------|
    | XLA (packed row gathers, default)    |  13.01  | 15,376  |
    | this kernel, BLK 32/16, concat input |  19.56  | 10,226  |
    | this kernel, BLK 64/32, concat input |  19.12  | 10,460  |
    | this kernel, BLK 32/16, two slabs    |  18.59  | 10,756  |
    | this kernel, BLK 64/32, two slabs    |  17.92  | 11,161  |
    | BLK 128 fwd / 64 bwd                 |  VMEM OOM (21.8M > 16M) |

The kernel LOSES by ~5 ms/step. Per-op trace (scripts/trace_ops.py):
fwd kernel 2.87 ms (~40 TF/s on its 116 GF of projections), bwd kernel
6.74 ms (~52 TF/s incl. recompute) — while XLA runs the IDENTICAL
projection matmuls at ~90 TF/s (0.67 ms fwd each) and its whole
attention segment (cos, concat, projections, einsums, softmax, fwd+bwd)
in ~8 ms. The premise that the XLA path is HBM-round-trip-bound was
wrong at this operating point: eliminating ~2.5 ms of HBM traffic
cannot pay for Mosaic's ~2x matmul-codegen deficit on these
(BLK*K, 444) x (444, 272) shapes (sequential VPU/MXU program order,
lane-misaligned head_dim=136 slices forcing relayouts). Kept as a
verified, parity-tested alternative (tests/test_gathered_attention.py);
TGAT's use_gathered_attention="auto" resolves OFF.

Kernel-tier scoreboard: the four MATMUL-ADJACENT attempts
(temporal_attention, cooccurrence, window-DMA, post-gather) all lose to
XLA's fused schedule; the MATERIALIZATION-bound time-channel kernel
(ops/pallas/time_channel.py) is the tier's measured win. The boundary
between the two classes is the tier's core finding — see BASELINE.md.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window_attention import _core, _heads_split, _mid_slice, _round_up

import os

BLK = int(os.environ.get("GA_BLK", "64"))  # query rows per program
BLK_BWD = int(os.environ.get("GA_BLK_BWD", "32"))  # best measured config


def _fwd_kernel(q_ref, featn_ref, feate_ref, dt_ref, mask_ref, keep_ref,
                tw_ref, tb_ref, wk_ref, wv_ref, out_ref, *, num_heads):
    ones = jnp.ones_like(dt_ref[:, :1])  # feat rows are already id-0 zeroed
    # node/edge slabs arrive separately (saves the XLA-side concatenate —
    # 1.34 ms/step of HBM copy at the TGAT operating point); the VMEM
    # concat here is a local copy
    feat = jnp.concatenate([featn_ref[:], feate_ref[:]], axis=-1)
    out, *_ = _core(
        q_ref[:], feat, dt_ref[:], mask_ref[:], ones, keep_ref[:],
        tw_ref[:], tb_ref[:], wk_ref[:], wv_ref[:], num_heads,
    )
    out_ref[:] = out


def _bwd_kernel(q_ref, featn_ref, feate_ref, dt_ref, mask_ref, keep_ref,
                tw_ref, tb_ref, wk_ref, wv_ref, dout_ref,
                dq_ref, dwk_ref, dwv_ref, dtw_ref, dtb_ref, *, num_heads):
    q3, mask, keep = q_ref[:], mask_ref[:], keep_ref[:]
    dt_col = dt_ref[:]
    tw, tb = tw_ref[:], tb_ref[:]
    wk, wv = wk_ref[:], wv_ref[:]
    blk, kk = mask.shape
    dq_dim = q3.shape[-1]
    hd = dq_dim // num_heads
    scale = hd ** -0.5
    ones = jnp.ones_like(dt_col[:, :1])

    _, scores_d, key, val, scores, phi, kvb = _core(
        q3, jnp.concatenate([featn_ref[:], feate_ref[:]], axis=-1), dt_col,
        mask, ones, keep, tw, tb, wk, wv, num_heads,
    )

    g = dout_ref[:]
    gh = _heads_split(g, num_heads)
    vh = _heads_split(val, num_heads)
    kh = _heads_split(key, num_heads)
    qh = _heads_split(q3, num_heads)

    dq3_parts, dkey_parts, dval_parts = [], [], []
    for h in range(num_heads):
        ds_d = (gh[h][:, None, :] * vh[h]).sum(-1)
        dval_parts.append(scores_d[h][:, :, None] * gh[h][:, None, :])
        ds = ds_d * _mid_slice(keep, h)
        sh = scores[h]
        dlog = sh * (ds - (ds * sh).sum(-1, keepdims=True))
        dlog = jnp.where(mask > 0, dlog, 0.0) * scale
        dq3_parts.append((dlog[:, :, None] * kh[h]).sum(1))
        dkey_parts.append(dlog[:, :, None] * qh[h][:, None, :])
    dq3 = jnp.concatenate(dq3_parts, axis=-1)
    dkey_f = jnp.concatenate(dkey_parts, axis=-1).reshape(blk * kk, dq_dim)
    dval_f = jnp.concatenate(dval_parts, axis=-1).reshape(blk * kk, dq_dim)

    d_feat = featn_ref.shape[-1] + feate_ref.shape[-1]
    dkv = (
        jnp.dot(dkey_f.astype(jnp.bfloat16), wk.astype(jnp.bfloat16).T,
                preferred_element_type=jnp.float32)
        + jnp.dot(dval_f.astype(jnp.bfloat16), wv.astype(jnp.bfloat16).T,
                  preferred_element_type=jnp.float32)
    )
    dphi = dkv[:, d_feat:]
    msin = -jnp.sin(dt_col * tw + tb)
    dtw_blk = (dphi * msin * dt_col).sum(0, keepdims=True)
    dtb_blk = (dphi * msin).sum(0, keepdims=True)

    dwk_blk = jnp.dot(kvb.T, dkey_f.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    dwv_blk = jnp.dot(kvb.T, dval_f.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)

    dq_ref[:] = dq3

    @pl.when(pl.program_id(0) == 0)
    def _():
        dwk_ref[:] = jnp.zeros_like(dwk_ref)
        dwv_ref[:] = jnp.zeros_like(dwv_ref)
        dtw_ref[:] = jnp.zeros_like(dtw_ref)
        dtb_ref[:] = jnp.zeros_like(dtb_ref)

    dwk_ref[:] += dwk_blk
    dwv_ref[:] += dwv_blk
    dtw_ref[:] += dtw_blk
    dtb_ref[:] += dtb_blk


def _pad_rows(x, m_pad):
    pad = m_pad - x.shape[0]
    if pad == 0:
        return x
    return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))


def _specs(k, d_n, d_e, dt_dim, dq, num_heads, blk):
    row = lambda *tail: pl.BlockSpec(
        (blk,) + tail, lambda i: (i,) + (0,) * len(tail),
        memory_space=pltpu.VMEM,
    )
    slab = lambda d: pl.BlockSpec(
        (blk * k, d), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    d_feat = d_n + d_e
    in_specs = [
        row(dq),  # q3
        slab(d_n),  # gathered node rows
        slab(d_e),  # gathered edge rows
        slab(1),  # dt column
        row(k),  # mask
        row(num_heads, k),  # keep
        full((1, dt_dim)), full((1, dt_dim)),  # tw, tb
        full((d_feat + dt_dim, dq)), full((d_feat + dt_dim, dq)),  # wk, wv
    ]
    return in_specs, row, full


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def gathered_attention(q3, feat_n, feat_e, dt, mask, keep, time_wb, wkv,
                       num_heads):
    """Post-gather fused single-query temporal attention.

    q3 (M, Dq) f32 projected query (heads flattened); feat_n (M*K, Dn) /
    feat_e (M*K, De) f32 pre-gathered kv node/edge feature rows, passed as
    SEPARATE slabs so the caller never materializes their concatenation in
    HBM (id-0 padding rows are zero — the sentinel contract); dt (M, K)
    f32 = t_query - t_neighbor; mask (M, K) f32; keep (M, H, K) f32
    dropout keep mask pre-scaled by 1/keep_prob; time_wb = (tw, tb)
    TimeEncoder params ((Dt,) each); wkv = (wk, wv) each (Dn+De+Dt, Dq).
    Returns out (M, Dq) — the pre-residual attention output of
    TemporalMultiHeadAttention (modules.py:137-188). feat_n/feat_e receive
    NO gradient (raw feature rows only).
    """
    return _ga_fwd_impl(q3, feat_n, feat_e, dt, mask, keep, time_wb, wkv,
                        num_heads)


def _ga_fwd_impl(q3, feat_n, feat_e, dt, mask, keep, time_wb, wkv, num_heads):
    tw, tb = time_wb
    wk, wv = wkv
    m, k = dt.shape
    dq = q3.shape[-1]
    d_n, d_e = feat_n.shape[-1], feat_e.shape[-1]
    dt_dim = tw.shape[-1]
    m_pad = _round_up(max(m, BLK), BLK)
    args = (
        _pad_rows(q3, m_pad),
        _pad_rows(feat_n, m_pad * k),
        _pad_rows(feat_e, m_pad * k),
        _pad_rows(dt, m_pad).reshape(m_pad * k, 1),
        _pad_rows(mask, m_pad),
        _pad_rows(keep, m_pad),
        tw.reshape(1, -1), tb.reshape(1, -1), wk, wv,
    )
    in_specs, row, _ = _specs(k, d_n, d_e, dt_dim, dq, num_heads, BLK)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads),
        grid=(m_pad // BLK,),
        in_specs=in_specs,
        out_specs=row(dq),
        out_shape=jax.ShapeDtypeStruct((m_pad, dq), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(*args)
    return out[:m]


def _ga_fwd(q3, feat_n, feat_e, dt, mask, keep, time_wb, wkv, num_heads):
    out = _ga_fwd_impl(q3, feat_n, feat_e, dt, mask, keep, time_wb, wkv,
                       num_heads)
    return out, (q3, feat_n, feat_e, dt, mask, keep, time_wb, wkv)


def _ga_bwd(num_heads, res, dout):
    q3, feat_n, feat_e, dt, mask, keep, time_wb, wkv = res
    tw, tb = time_wb
    wk, wv = wkv
    m, k = dt.shape
    dq = q3.shape[-1]
    d_n, d_e = feat_n.shape[-1], feat_e.shape[-1]
    dt_dim = tw.shape[-1]
    m_pad = _round_up(max(m, BLK_BWD), BLK_BWD)
    args = (
        _pad_rows(q3, m_pad),
        _pad_rows(feat_n, m_pad * k),
        _pad_rows(feat_e, m_pad * k),
        _pad_rows(dt, m_pad).reshape(m_pad * k, 1),
        _pad_rows(mask, m_pad),
        _pad_rows(keep, m_pad),
        tw.reshape(1, -1), tb.reshape(1, -1), wk, wv,
        _pad_rows(dout, m_pad),
    )
    in_specs, row, full = _specs(k, d_n, d_e, dt_dim, dq, num_heads, BLK_BWD)
    in_specs = in_specs + [row(dq)]
    dkv_dim = d_n + d_e + dt_dim
    dq3, dwk, dwv, dtw, dtb = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads),
        grid=(m_pad // BLK_BWD,),
        in_specs=in_specs,
        out_specs=(
            row(dq),
            full((dkv_dim, dq)), full((dkv_dim, dq)),
            full((1, dt_dim)), full((1, dt_dim)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, dq), jnp.float32),
            jax.ShapeDtypeStruct((dkv_dim, dq), jnp.float32),
            jax.ShapeDtypeStruct((dkv_dim, dq), jnp.float32),
            jax.ShapeDtypeStruct((1, dt_dim), jnp.float32),
            jax.ShapeDtypeStruct((1, dt_dim), jnp.float32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(*args)
    return (
        dq3[:m], jnp.zeros_like(feat_n), jnp.zeros_like(feat_e),
        jnp.zeros_like(dt), jnp.zeros_like(mask), jnp.zeros_like(keep),
        (dtw.reshape(-1), dtb.reshape(-1)), (dwk, dwv),
    )


gathered_attention.defvjp(_ga_fwd, _ga_bwd)


def gathered_attention_reference(q3, feat_n, feat_e, dt, mask, keep, time_wb,
                                 wkv, num_heads):
    """Pure-XLA oracle with identical bf16 math (parity tests)."""
    tw, tb = time_wb
    wk, wv = wkv
    m, k = dt.shape
    dq = q3.shape[-1]
    hd = dq // num_heads
    phi = jnp.cos(dt.reshape(m * k, 1) * tw + tb)
    kv = jnp.concatenate([feat_n, feat_e, phi], axis=-1)
    kvb = kv.astype(jnp.bfloat16)
    key = jnp.dot(kvb, wk.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32).reshape(m, k, dq)
    val = jnp.dot(kvb, wv.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32).reshape(m, k, dq)
    scale = hd ** -0.5
    outs = []
    for h in range(num_heads):
        qh = q3[:, h * hd : (h + 1) * hd]
        kh = key[..., h * hd : (h + 1) * hd]
        vh = val[..., h * hd : (h + 1) * hd]
        lh = (qh[:, None, :] * kh).sum(-1) * scale
        lh = jnp.where(mask > 0, lh, -1e10)
        sh = jax.nn.softmax(lh, axis=-1) * keep[:, h, :]
        outs.append((sh[:, :, None] * vh).sum(1))
    return jnp.concatenate(outs, axis=-1)
