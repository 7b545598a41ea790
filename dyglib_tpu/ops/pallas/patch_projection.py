"""Pallas TPU kernel: patch-flattened channel projection for DyGFormer.

Target: the node/edge channel projections at long operating points.
XLA's lowering of

    out = patches(x) @ W + bias        # patches: (M, Lp, D) -> (M, P, patch*D)

materializes the (M, P, patch*D) repack in HBM — at CanParl (patch 64,
D 172) an 11008-lane relayout costing ~7 ms/step across fwd+bwd reshapes
(trace, BASELINE.md round 4). Folding the flatten into a 2-contracting-dim
dot_general measured WORSE (49.3 vs 46.5 ms/step — XLA materializes its
own transpose). This kernel is the time-channel pattern without the trig:
read the (BLK, patch, D) tile, run the patch-slot dots in VMEM
(x_ref[:, j, :] is a sublane slice — no lane extraction), accumulate, and
write only the (BLK, ced) output. The flattened tensor never exists.

The custom VJP emits NO input cotangent — the consumers are the raw
node/edge feature tables, which are frozen (never differentiated) in
every DyGLib model. The co-occurrence channel (whose input carries
gradients to the count-MLP) stays on the XLA path.

MEASURED VERDICT (B=200, fused 16-step scan, same hour, triple-expand +
fast-trig time kernel, CanParl 2048/64): **NEGATIVE** — 59.5-68.7
ms/step across three block structures (contiguous f32 BLK 64, 2D
slot-group grid with accumulating output, contiguous bf16 BLK 128) vs
39.5 ms/step for the XLA repack path. Root cause: the VMEM budget caps
row blocks at 64-128, so the patch loop runs 64 sequential (BLK, 172) x
(172, 50) micro-dots per program at <25% MXU utilization — while XLA's
repack, though it materializes ~845 MB, feeds ONE (19200, 11008) x
(11008, 50) matmul at high utilization. The time-channel kernel wins
this trade only because its avoided tensor is 655 MB of COMPUTED
(cos) features; here the repack streams at 460 GB/s and the dot is
efficient. Kept parity-tested (tests/test_patch_projection.py), default
OFF (DyGFormer.use_patch_kernel "auto" resolves OFF).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window_attention import _round_up

# VMEM: the fwd x block is (BLK, patch, D) bf16 (the host casts x to
# bf16 — XLA fuses the cast into the producing gather, and the kernel's
# matmul math is bf16 either way) = BLK*22KB at CanParl, double-buffered:
# BLK 256 = 11.3MB + the 2.2MB weight under the 16MB scoped limit.
# A 2D slot-group grid was measured FAR worse (68.7 ms/step vs 39.5
# baseline: middle-dim blocks make every row a strided DMA segment);
# contiguous row blocks with the full patch axis resident win.
PP_BLK = int(os.environ.get("PP_BLK", "256"))  # patch rows per program
PP_BLK_BWD = int(os.environ.get("PP_BLK_BWD", "128"))


def _fwd_kernel(x_ref, w_ref, bias_ref, out_ref, *, patch):
    d = x_ref.shape[-1]
    acc = jnp.broadcast_to(bias_ref[:], (out_ref.shape[0], out_ref.shape[1]))
    for j in range(patch):
        acc = acc + jnp.dot(
            x_ref[:, j, :],
            w_ref[j * d : (j + 1) * d, :].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc


def _bwd_kernel(x_ref, dout_ref, dw_ref, dbias_ref, *, patch):
    d = x_ref.shape[-1]
    g = dout_ref[:]
    gb = g.astype(jnp.bfloat16)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    for j in range(patch):
        dw_ref[j * d : (j + 1) * d, :] += jnp.dot(
            x_ref[:, j, :].T, gb, preferred_element_type=jnp.float32
        )
    dbias_ref[:] += g.sum(0, keepdims=True)


def _pad_rows(x, n):
    pad = n - x.shape[0]
    return x if pad == 0 else jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def patch_projection(x, w, bias, patch):
    """patches(x) @ w + bias without materializing the flatten.

    x (M, Lp, D) f32; w (patch*D, ced); bias (ced,). Returns
    (M, Lp//patch, ced) with the same bf16 single-pass matmul math as the
    XLA path. NO gradient flows to x (frozen feature tables only).
    """
    return _fwd_impl(x, w, bias, patch)


def _fwd_impl(x, w, bias, patch):
    m, lp, d = x.shape
    p = lp // patch
    ced = w.shape[-1]
    rows = m * p
    rows_pad = _round_up(max(rows, PP_BLK), PP_BLK)
    xr = _pad_rows(x.reshape(rows, patch, d).astype(jnp.bfloat16), rows_pad)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, patch=patch),
        grid=(rows_pad // PP_BLK,),
        in_specs=[
            pl.BlockSpec((PP_BLK, patch, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((patch * d, ced), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ced), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PP_BLK, ced), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, ced), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(xr, w, bias.reshape(1, -1))
    return out[:rows].reshape(m, p, ced)


def _fwd(x, w, bias, patch):
    return _fwd_impl(x, w, bias, patch), (x, w.shape[-1])


def _bwd(patch, res, dout):
    x, ced = res
    m, lp, d = x.shape
    p = lp // patch
    rows = m * p
    rows_pad = _round_up(max(rows, PP_BLK_BWD), PP_BLK_BWD)
    xr = _pad_rows(x.reshape(rows, patch, d).astype(jnp.bfloat16), rows_pad)
    dr = _pad_rows(dout.reshape(rows, ced), rows_pad)
    dw, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, patch=patch),
        grid=(rows_pad // PP_BLK_BWD,),
        in_specs=[
            pl.BlockSpec((PP_BLK_BWD, patch, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PP_BLK_BWD, ced), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((patch * d, ced), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ced), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((patch * d, ced), jnp.float32),
            jax.ShapeDtypeStruct((1, ced), jnp.float32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(xr, dr)
    return jnp.zeros_like(x), dw, dbias.reshape(-1)


patch_projection.defvjp(_fwd, _bwd)


def patch_projection_reference(x, w, bias, patch):
    """Pure-XLA oracle with identical bf16 matmul math (parity tests)."""
    m, lp, d = x.shape
    p = lp // patch
    xf = x.reshape(m * p, patch * d)
    out = jnp.dot(xf.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32) + bias
    return out.reshape(m, p, -1)
