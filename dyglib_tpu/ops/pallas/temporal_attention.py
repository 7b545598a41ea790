"""Pallas TPU kernel: fused single-query temporal attention.

This is the shared hot op of TGAT and the TGN-family graph-attention
embedding (reference models/modules.py:99-206, SURVEY §2.3): one query
token per row attends over its K sampled temporal neighbors,

    key = value = [nbr_feat || edge_feat || Phi(dt)] @ W,

with padded neighbors masked at logit -1e10. The XLA lowering of the
unfused graph materializes the (M*K, 444) concat, both (M*K, 272) key and
value tensors, and four layout copies of the gathered features in HBM
(scripts/trace_ops.py breakdown at the TGAT operating point); this kernel
keeps every intermediate in VMEM — per M-block: concat -> K/V projection
(MXU, bf16 with f32 accumulation, exactly XLA's default TPU matmul
precision) -> masked softmax -> score dropout -> weighted sum — and a
custom VJP recomputes those intermediates in the backward block instead of
saving them (flash-attention-style rematerialization).

Boundary: the query projection, Phi(dt) (shared TimeEncoder), residual_fc,
and LayerNorm stay in XLA — they are cheap at M rows (vs M*K) and keeping
Phi outside lets the time-encoder parameters take their ordinary autodiff
path. Score dropout uses a caller-provided keep mask (already scaled by
1/keep_prob) so the train step's RNG discipline stays in one place.

The weight-gradient outputs (dWk, dWv) are accumulated across the
sequential TPU grid into a constant-index output block, which Mosaic keeps
resident in VMEM for the whole sweep.

MEASURED VERDICT (TPU v5e, TGAT B=200/K=20/L=2 fused-scan step): 19.2
ms/step vs the XLA path's 12.9 — XLA's schedule (concat fused into the
projection matmuls, bf16 single-pass by default, batched-matvec attention
at ~700 GB/s) is already near roofline, and the kernel pays per-program
overhead at BLK=32 over ~400 grid steps plus lane-padding on the K=20 /
444-dim unaligned shapes (BLK=64 crashes the Mosaic pipeline on this
toolchain). The models therefore default to the XLA path
(TGAT.use_fused_attention="auto" resolves to off); the kernel is retained
as a VERIFIED alternative (parity + grad tests in
tests/test_pallas_attention.py) and the harness for future shapes where
fusion should win (larger K, layer-2 features already in VMEM).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 32  # query rows per program (VMEM budget: ~BLK*K*(Dkv+2*Dq) floats)
NEG = -1e10  # pad logit (modules.py:182-184 — NOT -inf)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _heads_split(x, h):
    # (..., H*hd) -> list of H (..., hd) slices (static unroll; tiny H)
    hd = x.shape[-1] // h
    return [x[..., i * hd : (i + 1) * hd] for i in range(h)]


def _mid_slice(x, h):
    """x[:, h, :] without integer indexing (Mosaic lowers that via an
    unsupported 3D gather): slice + reshape only."""
    return x[:, h : h + 1, :].reshape(x.shape[0], x.shape[2])


def _attention_core(q3, nbr, edge, phi, mask, keep, wk, wv, num_heads):
    """Shared fwd math on one block; returns (out, scores_dropped per head,
    key, val, scores_pre per head). All f32 except the bf16 MXU passes."""
    blk, k, _ = nbr.shape
    dq = q3.shape[-1]
    hd = dq // num_heads
    kv = jnp.concatenate([nbr, edge, phi], axis=-1).reshape(blk * k, -1)
    kvb = kv.astype(jnp.bfloat16)
    key = jnp.dot(kvb, wk.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32).reshape(blk, k, dq)
    val = jnp.dot(kvb, wv.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32).reshape(blk, k, dq)

    scale = hd ** -0.5
    scores, scores_d, outs = [], [], []
    for h, (qh, kh, vh) in enumerate(
        zip(*(_heads_split(x, num_heads) for x in (q3, key, val)))
    ):
        lh = (qh[:, None, :] * kh).sum(-1) * scale  # (blk, k)
        lh = jnp.where(mask > 0, lh, NEG)
        sh = jax.nn.softmax(lh, axis=-1)
        shd = sh * _mid_slice(keep, h)
        scores.append(sh)
        scores_d.append(shd)
        outs.append((shd[:, :, None] * vh).sum(1))  # (blk, hd)
    out = jnp.concatenate(outs, axis=-1)  # (blk, Dq)
    return out, scores_d, key, val, scores


def _fwd_kernel(q_ref, nbr_ref, edge_ref, phi_ref, mask_ref, keep_ref,
                wk_ref, wv_ref, out_ref, scores_ref, *, num_heads):
    out, scores_d, *_ = _attention_core(
        q_ref[:], nbr_ref[:], edge_ref[:], phi_ref[:], mask_ref[:],
        keep_ref[:], wk_ref[:], wv_ref[:], num_heads,
    )
    out_ref[:] = out
    scores_ref[:] = jnp.concatenate([s[:, None, :] for s in scores_d], axis=1)


def _bwd_kernel(q_ref, nbr_ref, edge_ref, phi_ref, mask_ref, keep_ref,
                wk_ref, wv_ref, dout_ref, dscores_ref,
                dq_ref, dnbr_ref, dedge_ref, dphi_ref, dwk_ref, dwv_ref,
                *, num_heads, dn, de):
    q3, nbr, edge, phi = q_ref[:], nbr_ref[:], edge_ref[:], phi_ref[:]
    mask, keep, wk, wv = mask_ref[:], keep_ref[:], wk_ref[:], wv_ref[:]
    blk, k, _ = nbr.shape
    dq_dim = q3.shape[-1]
    hd = dq_dim // num_heads
    scale = hd ** -0.5

    _, scores_d, key, val, scores = _attention_core(
        q3, nbr, edge, phi, mask, keep, wk, wv, num_heads,
    )

    g = dout_ref[:]  # (blk, Dq)
    gh = _heads_split(g, num_heads)
    vh = _heads_split(val, num_heads)
    kh = _heads_split(key, num_heads)
    qh = _heads_split(q3, num_heads)

    dq3_parts, dkey_parts, dval_parts = [], [], []
    for h in range(num_heads):
        # d wrt dropped scores: from the weighted sum + any direct cotangent
        ds_d = (gh[h][:, None, :] * vh[h]).sum(-1) + _mid_slice(
            dscores_ref[:], h
        )  # (blk, k)
        dval_parts.append(scores_d[h][:, :, None] * gh[h][:, None, :])
        # through dropout multiply, then softmax
        ds = ds_d * _mid_slice(keep, h)
        sh = scores[h]
        dlog = sh * (ds - (ds * sh).sum(-1, keepdims=True))
        dlog = jnp.where(mask > 0, dlog, 0.0) * scale  # (blk, k)
        dq3_parts.append((dlog[:, :, None] * kh[h]).sum(1))
        dkey_parts.append(dlog[:, :, None] * qh[h][:, None, :])
    dq3 = jnp.concatenate(dq3_parts, axis=-1)  # (blk, Dq)
    dkey = jnp.concatenate(dkey_parts, axis=-1)  # (blk, k, Dq)
    dval = jnp.concatenate(dval_parts, axis=-1)  # (blk, k, Dq)

    kv = jnp.concatenate([nbr, edge, phi], axis=-1).reshape(blk * k, -1)
    kvb = kv.astype(jnp.bfloat16)
    dkey_f = dkey.reshape(blk * k, dq_dim)
    dval_f = dval.reshape(blk * k, dq_dim)
    dkv = (
        jnp.dot(dkey_f.astype(jnp.bfloat16), wk.astype(jnp.bfloat16).T,
                preferred_element_type=jnp.float32)
        + jnp.dot(dval_f.astype(jnp.bfloat16), wv.astype(jnp.bfloat16).T,
                  preferred_element_type=jnp.float32)
    ).reshape(blk, k, -1)

    dq_ref[:] = dq3
    dnbr_ref[:] = dkv[:, :, :dn]
    dedge_ref[:] = dkv[:, :, dn : dn + de]
    dphi_ref[:] = dkv[:, :, dn + de :]

    dwk_blk = jnp.dot(kvb.T, dkey_f.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    dwv_blk = jnp.dot(kvb.T, dval_f.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dwk_ref[:] = jnp.zeros_like(dwk_ref)
        dwv_ref[:] = jnp.zeros_like(dwv_ref)

    dwk_ref[:] += dwk_blk
    dwv_ref[:] += dwv_blk


def _pad_rows(x, m_pad):
    pad = m_pad - x.shape[0]
    if pad == 0:
        return x
    return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))


def _block_specs(m_pad, k, dn, de, dt, dq, num_heads):
    row = lambda *tail: pl.BlockSpec(
        (BLK,) + tail, lambda i: (i,) + (0,) * len(tail),
        memory_space=pltpu.VMEM,
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        row(dq),  # q3 flattened heads
        row(k, dn), row(k, de), row(k, dt),  # nbr, edge, phi
        row(k),  # mask
        row(num_heads, k),  # keep
        full((dn + de + dt, dq)), full((dn + de + dt, dq)),  # wk, wv
    ]
    return in_specs, row, full


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def temporal_attention(q3, nbr, edge, phi, mask, keep, wk, wv, num_heads):
    """Fused single-query temporal attention.

    q3 (M, Dq) f32 — projected query, heads flattened; nbr/edge/phi
    (M, K, D*) f32; mask (M, K) f32 (1 = real neighbor); keep (M, H, K)
    f32 dropout keep mask pre-scaled by 1/keep_prob (ones for eval);
    wk/wv (Dn+De+Dt, Dq) f32. Returns (out (M, Dq), scores (M, H, K)
    post-dropout), matching TemporalMultiHeadAttention's pre-residual
    attention output (modules.py:137-188).
    """
    return _ta_fwd_impl(q3, nbr, edge, phi, mask, keep, wk, wv, num_heads)


def _ta_fwd_impl(q3, nbr, edge, phi, mask, keep, wk, wv, num_heads):
    m, k, dn = nbr.shape
    de, dt, dq = edge.shape[-1], phi.shape[-1], q3.shape[-1]
    m_pad = _round_up(max(m, BLK), BLK)
    args = (
        _pad_rows(q3, m_pad), _pad_rows(nbr, m_pad), _pad_rows(edge, m_pad),
        _pad_rows(phi, m_pad), _pad_rows(mask, m_pad), _pad_rows(keep, m_pad),
        wk, wv,
    )
    in_specs, row, _ = _block_specs(m_pad, k, dn, de, dt, dq, num_heads)
    out, scores = pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads),
        grid=(m_pad // BLK,),
        in_specs=in_specs,
        out_specs=(row(dq), row(num_heads, k)),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, dq), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, num_heads, k), jnp.float32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(*args)
    return out[:m], scores[:m]


def _ta_fwd(q3, nbr, edge, phi, mask, keep, wk, wv, num_heads):
    out = _ta_fwd_impl(q3, nbr, edge, phi, mask, keep, wk, wv, num_heads)
    return out, (q3, nbr, edge, phi, mask, keep, wk, wv)


def _ta_bwd(num_heads, res, cts):
    q3, nbr, edge, phi, mask, keep, wk, wv = res
    dout, dscores = cts
    m, k, dn = nbr.shape
    de, dt, dq = edge.shape[-1], phi.shape[-1], q3.shape[-1]
    m_pad = _round_up(max(m, BLK), BLK)
    args = (
        _pad_rows(q3, m_pad), _pad_rows(nbr, m_pad), _pad_rows(edge, m_pad),
        _pad_rows(phi, m_pad), _pad_rows(mask, m_pad), _pad_rows(keep, m_pad),
        wk, wv,
        _pad_rows(dout, m_pad), _pad_rows(dscores, m_pad),
    )
    in_specs, row, full = _block_specs(m_pad, k, dn, de, dt, dq, num_heads)
    in_specs = in_specs + [row(dq), row(num_heads, k)]
    dkv_dim = dn + de + dt
    dq3, dnbr, dedge, dphi, dwk, dwv = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads, dn=dn, de=de),
        grid=(m_pad // BLK,),
        in_specs=in_specs,
        out_specs=(
            row(dq), row(k, dn), row(k, de), row(k, dt),
            full((dkv_dim, dq)), full((dkv_dim, dq)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, dq), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, k, dn), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, k, de), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, k, dt), jnp.float32),
            jax.ShapeDtypeStruct((dkv_dim, dq), jnp.float32),
            jax.ShapeDtypeStruct((dkv_dim, dq), jnp.float32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(*args)
    return (
        dq3[:m], dnbr[:m], dedge[:m], dphi[:m],
        jnp.zeros_like(mask), jnp.zeros_like(keep), dwk, dwv,
    )


temporal_attention.defvjp(_ta_fwd, _ta_bwd)
