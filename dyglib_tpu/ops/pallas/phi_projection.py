"""Pallas TPU kernel: fused Phi(dt) @ W projection.

The winning pattern of ops/pallas/time_channel.py transferred to the
temporal-attention K/V projections: a kv row is [feat || Phi(dt)], so

    key = kv @ Wk = feat @ Wk[:Df] + Phi(dt) @ Wk[Df:]

and the second term is a MATERIALIZATION-bound op XLA lowers as
cos -> (M*K, Dt) HBM tensor -> concatenate -> matmul (plus the mirrored
backward: reduce_sum for d(tw)/d(tb) over the same tensor). This kernel
computes Phi in VMEM and contracts immediately: the (M*K, Dt) tensor
never exists in HBM, and the concatenate disappears because the feat
matmul runs on the un-concatenated 344-wide rows.

No mask input: the reference feeds Phi(dt) for pad entries too — padding
is handled by the attention logits (-1e10), not feature zeroing
(models/modules.py:99-206, TGAT.py:114-119).

VJP: d(w_phi) = Phi^T dout (Phi recomputed flash-style), d(tw)/d(tb)
through -sin, dt gets no cotangent (integer time keys are data).

MEASURED VERDICT (TGAT B=200, K=20, L=2, fused 32-step scan, same hour,
sandwiched): plain XLA 12.83 / 12.93 ms/step, phi-fusion 34.35 ms/step —
the kernel path LOSES 2.7x. The pattern that won for time_channel.py
does not transfer: here the avoided materialization is ~101 MB/step
(vs 655 MB there) while the split feat/phi matmuls + the pallas-call
boundary break XLA's fused kv-projection schedule (each (252k, 272)
partial product materializes f32 before the add, where the one-matmul
path keeps a single bf16-tiled output). Kept as a parity-tested
alternative; TGAT(use_phi_fusion="auto") resolves OFF.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window_attention import _round_up

BLK = int(os.environ.get("PP_BLK", "1024"))  # rows per program
BLK_BWD = int(os.environ.get("PP_BLK_BWD", "512"))


def _fwd_kernel(dt_ref, tw_ref, tb_ref, w_ref, out_ref):
    phi = jnp.cos(dt_ref[:] * tw_ref[:] + tb_ref[:])
    out_ref[:] = jnp.dot(
        phi.astype(jnp.bfloat16), w_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _bwd_kernel(dt_ref, tw_ref, tb_ref, w_ref, dout_ref,
                dw_ref, dtw_ref, dtb_ref):
    tw, tb = tw_ref[:], tb_ref[:]
    theta = dt_ref[:] * tw + tb
    phi = jnp.cos(theta)
    g = dout_ref[:]
    gb = g.astype(jnp.bfloat16)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        dtw_ref[:] = jnp.zeros_like(dtw_ref)
        dtb_ref[:] = jnp.zeros_like(dtb_ref)

    dw_ref[:] += jnp.dot(phi.astype(jnp.bfloat16).T, gb,
                         preferred_element_type=jnp.float32)
    dphi = jnp.dot(gb, w_ref[:].astype(jnp.bfloat16).T,
                   preferred_element_type=jnp.float32)
    common = dphi * (-jnp.sin(theta))
    dtw_ref[:] += (common * dt_ref[:]).sum(0, keepdims=True)
    dtb_ref[:] += common.sum(0, keepdims=True)


def _pad_rows(x, n):
    pad = n - x.shape[0]
    return x if pad == 0 else jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))


@jax.custom_vjp
def phi_projection(dt, tw, tb, w):
    """Phi(dt) @ w without materializing Phi.

    dt (R,) or (R, 1) f32 time deltas; tw/tb (Dt,) TimeEncoder params;
    w (Dt, Dq). Returns (R, Dq) f32 == cos(dt[:, None] * tw + tb) @ w
    with bf16 matmul math (XLA's default single-pass precision).
    """
    return _fwd_impl(dt, tw, tb, w)


def _fwd_impl(dt, tw, tb, w):
    dt_col = dt.reshape(-1, 1)
    r = dt_col.shape[0]
    dq = w.shape[-1]
    dt_dim = tw.shape[-1]
    r_pad = _round_up(max(r, BLK), BLK)
    row = lambda d: pl.BlockSpec((BLK, d), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(r_pad // BLK,),
        in_specs=[row(1), full((1, dt_dim)), full((1, dt_dim)),
                  full((dt_dim, dq))],
        out_specs=row(dq),
        out_shape=jax.ShapeDtypeStruct((r_pad, dq), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(_pad_rows(dt_col, r_pad), tw.reshape(1, -1), tb.reshape(1, -1), w)
    return out[:r]


def _fwd(dt, tw, tb, w):
    return _fwd_impl(dt, tw, tb, w), (dt, tw, tb, w)


def _bwd(res, dout):
    dt, tw, tb, w = res
    dt_col = dt.reshape(-1, 1)
    r = dt_col.shape[0]
    dq = w.shape[-1]
    dt_dim = tw.shape[-1]
    r_pad = _round_up(max(r, BLK_BWD), BLK_BWD)
    row = lambda d: pl.BlockSpec((BLK_BWD, d), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    dw, dtw, dtb = pl.pallas_call(
        _bwd_kernel,
        grid=(r_pad // BLK_BWD,),
        in_specs=[row(1), full((1, dt_dim)), full((1, dt_dim)),
                  full((dt_dim, dq)), row(dq)],
        out_specs=(full((dt_dim, dq)), full((1, dt_dim)), full((1, dt_dim))),
        out_shape=(
            jax.ShapeDtypeStruct((dt_dim, dq), jnp.float32),
            jax.ShapeDtypeStruct((1, dt_dim), jnp.float32),
            jax.ShapeDtypeStruct((1, dt_dim), jnp.float32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(_pad_rows(dt_col, r_pad), tw.reshape(1, -1), tb.reshape(1, -1), w,
      _pad_rows(dout.reshape(r, dq), r_pad))
    return (
        jnp.zeros_like(dt), dtw.reshape(-1), dtb.reshape(-1), dw,
    )


phi_projection.defvjp(_fwd, _bwd)


def phi_projection_reference(dt, tw, tb, w):
    """Pure-XLA oracle with identical bf16 matmul math."""
    phi = jnp.cos(dt.reshape(-1, 1) * tw + tb)
    return jnp.dot(phi.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
