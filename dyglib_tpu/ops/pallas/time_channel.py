"""Pallas TPU kernel: fused time-channel patch projection for DyGFormer.

Target: the per-entry TIME channel at long operating points. XLA's
lowering of

    time_feat = where(valid, cos(dt[..., None] * w + b), 0)   # (M, L, Dt)
    out       = patches(time_feat) @ W + bias                 # (M, P, ced)

materializes the full (M, L, Dt) masked feature tensor in HBM (matmul
operands are not fusion targets on TPU XLA). At the CanParl operating
point (M=800 rows, L=2048, Dt=100) that is ~655 MB written + re-read per
direction — the per-op trace attributes ~20 ms/step to this channel
(select_n 7.2 + mul 3.5 + proj_time fwd+bwd 9.3) for ~33 GF of actual
matmul work.

This kernel computes Phi(dt) on-chip per patch slot and contracts it
immediately: HBM traffic drops to reading dt/valid (M*L f32) and writing
the (M, P, ced) output. The slot loop runs 64 small (BLK_P, Dt) x
(Dt, ced) matmuls rather than one (BLK_P, patch*Dt) matmul — building
the concatenated layout in VMEM would need lane-offset scatter stores at
Dt(=100)-stride, which Mosaic lowers poorly; the small-matmul loop keeps
every operand naturally tiled.

Backward recomputes Phi per slot (flash-style): dW_j += Phi_j^T dout,
d(tw)/d(tb) accumulate through -sin, no cotangent for dt (time keys are
integers; the reference's time encoder gets gradients only through
w and b here — dt itself is data).

MEASURED VERDICT (B=200, fused 32-step scan, same hour, triple-expand
trainer) — the kernel tier's FIRST measured win:

    | DyGFormer operating point        | XLA path | this kernel |     |
    |----------------------------------|----------|-------------|-----|
    | CanParl (maxlen 2048, patch 64)  | 51.88 ms | 46.29 ms    |1.12x|
    | lastfm  (maxlen 512, patch 16)   | 17.63 ms | 16.71 ms    |1.06x|

(BLK 512 fwd / 128 bwd; 256/16 and 1024/64 measured worse or VMEM-OOM —
the unrolled slot loop's temporaries live on the VMEM stack.)

ROUND 4: the kernel was measured ~80%% cosine; with the fast-trig path
(TC_FAST_TRIG, default ON — see the header note above the flag) the
whole-model numbers moved CanParl 46.4 -> 39.5 ms/step (1.18x) and
lastfm 16.7 -> 15.4 (1.09x), end-metric neutral (TPU 8-epoch best val
AP 0.9482 fast vs 0.9471 plain-path at the calibration operating
point). Follow-up
measurement: even at patch 1 (wikipedia/reddit maxlen 32) the kernel wins
~4% (8.40/8.54/8.61 vs 8.74/8.87 ms/step back-to-back), so "auto"
resolves ON everywhere. This wins where the four
earlier kernels lost because the target op is MATERIALIZATION-bound
(TPU XLA does not fuse elementwise producers into dot operands), not
matmul-codegen-bound.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window_attention import _round_up

BLK_P = int(os.environ.get("TC_BLK", "512"))  # patch rows per program
# slot batching (round 4): pad Dt (100) to 128 lanes so SLOT consecutive
# patch slots' Phi blocks concatenate lane-ALIGNED in VMEM, turning SLOT
# small K=100 matmuls into one K=SLOT*128 matmul (the original header's
# "lane-offset scatter at Dt-stride" objection only applies to the
# unpadded 100-lane layout). Zero-padded tw/tb rows make Phi pads cos(0)=1
# but the matching w_pad rows are zero, so the contraction is exact.
# MEASURED NEGATIVE at CanParl (46.8-48.2 vs 46.4 ms/step across
# SLOT=4/8/16, TC_BLK_BWD=32/64): the kernel is VPU-bound on the cos
# evaluation, and padding adds 28% VPU work that cancels the dot gains;
# bwd at SLOT=8/BLK 128 also exceeds the 16M scoped-VMEM limit. Kept as a
# parity-tested variant (TC_SLOT env); 0 = legacy per-slot loop (default).
TC_SLOT = int(os.environ.get("TC_SLOT", "0"))
# fast-math trig (round 4): the kernel is ~80% cosine — XLA's TPU cos
# spends ~36 cycles/element on extended-precision range reduction
# (isolated ablation: fwd kernel 5.1 ms with jnp.cos, 1.1 ms without,
# 1.35 ms with the Cody-Waite+polynomial path below = 3.8x on the fwd
# kernel at CanParl shapes). Accuracy: <=1e-4 abs for |theta| <~ 2.6e4
# (k < 2^12, where the two-term reduction is exact); up to ~3e-2 at
# theta ~ 1e6, where f32's own input quantization (ulp(theta) ~ 0.06 rad)
# already exceeds the approximation error and the bf16 matmul consuming
# Phi rounds harder than that. TC_FAST_TRIG=0 restores jnp.cos/sin
# (bitwise XLA parity); the oracle/parity tests run at small-theta
# scales where both paths agree within the existing tolerances.
# TC_FAST_TRIG: "1"/"0" forces the kernel's trig path; unset defers to
# the shared gate (dyglib_tpu/ops/fast_trig.py: DYGLIB_FAST_TRIG,
# default auto = ON on TPU, OFF on CPU so parity tests stay exact).
from ..fast_trig import enabled as _ft_enabled
from ..fast_trig import fast_cos as _fast_cos
from ..fast_trig import fast_sincos as _fast_sincos


def _use_fast() -> bool:
    mode = os.environ.get("TC_FAST_TRIG")
    if mode is not None:
        return mode == "1"
    return _ft_enabled()


def _cos(x):
    return _fast_cos(x) if _use_fast() else jnp.cos(x)


def _sincos(x):
    """(sin x, cos x) sharing one range reduction (backward kernel)."""
    if _use_fast():
        return _fast_sincos(x)
    return jnp.sin(x), jnp.cos(x)
# backward holds per-slot temporaries for every UNROLLED slot iteration on
# the VMEM stack; 256-row blocks measured 26.2M scoped (> 16M limit) at
# patch=64
BLK_P_BWD = int(os.environ.get("TC_BLK_BWD", "128"))


def _fwd_kernel(dt_ref, valid_ref, tw_ref, tb_ref, w_ref, bias_ref, out_ref,
                *, patch):
    dt_dim = tw_ref.shape[-1]
    acc = jnp.broadcast_to(bias_ref[:], (out_ref.shape[0], out_ref.shape[1]))
    for j in range(patch):
        phi = _cos(dt_ref[:, j : j + 1] * tw_ref[:] + tb_ref[:])
        phi = phi * valid_ref[:, j : j + 1]
        acc = acc + jnp.dot(
            phi.astype(jnp.bfloat16),
            w_ref[j * dt_dim : (j + 1) * dt_dim, :].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc


def _fwd_kernel_slots(dt_ref, valid_ref, tw_ref, tb_ref, w_ref, bias_ref,
                      out_ref, *, patch, slot):
    dtp = tw_ref.shape[-1]  # 128-padded Dt
    acc = jnp.broadcast_to(bias_ref[:], (out_ref.shape[0], out_ref.shape[1]))
    for j0 in range(0, patch, slot):
        phi_cat = jnp.concatenate(
            [
                _cos(dt_ref[:, j : j + 1] * tw_ref[:] + tb_ref[:])
                * valid_ref[:, j : j + 1]
                for j in range(j0, j0 + slot)
            ],
            axis=1,
        )  # (BLK, slot*dtp) — lane-aligned concat of 128-wide blocks
        acc = acc + jnp.dot(
            phi_cat.astype(jnp.bfloat16),
            w_ref[j0 * dtp : (j0 + slot) * dtp, :].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc


def _bwd_kernel_slots(dt_ref, valid_ref, tw_ref, tb_ref, w_ref, dout_ref,
                      dw_ref, dtw_ref, dtb_ref, dbias_ref, *, patch, slot):
    dtp = tw_ref.shape[-1]
    tw, tb = tw_ref[:], tb_ref[:]
    g = dout_ref[:]
    gb = g.astype(jnp.bfloat16)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        dtw_ref[:] = jnp.zeros_like(dtw_ref)
        dtb_ref[:] = jnp.zeros_like(dtb_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    dtw_acc = jnp.zeros((1, dtp), jnp.float32)
    dtb_acc = jnp.zeros((1, dtp), jnp.float32)
    for j0 in range(0, patch, slot):
        thetas = [
            dt_ref[:, j : j + 1] * tw + tb for j in range(j0, j0 + slot)
        ]
        vcols = [valid_ref[:, j : j + 1] for j in range(j0, j0 + slot)]
        sincs = [_sincos(th) for th in thetas]
        phi_cat = jnp.concatenate(
            [sc[1] * v for sc, v in zip(sincs, vcols)], axis=1
        )
        w_grp = w_ref[j0 * dtp : (j0 + slot) * dtp, :]
        dw_ref[j0 * dtp : (j0 + slot) * dtp, :] += jnp.dot(
            phi_cat.astype(jnp.bfloat16).T, gb,
            preferred_element_type=jnp.float32,
        )
        dphi_cat = jnp.dot(
            gb, w_grp.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )  # zero on pad lanes (w_grp pad rows are zero)
        for i, j in enumerate(range(j0, j0 + slot)):
            dphi = dphi_cat[:, i * dtp : (i + 1) * dtp]
            common = dphi * (-sincs[i][0]) * vcols[i]
            dtw_acc = dtw_acc + (common * dt_ref[:, j : j + 1]).sum(
                0, keepdims=True
            )
            dtb_acc = dtb_acc + common.sum(0, keepdims=True)
    dtw_ref[:] += dtw_acc
    dtb_ref[:] += dtb_acc
    dbias_ref[:] += g.sum(0, keepdims=True)


def _bwd_kernel(dt_ref, valid_ref, tw_ref, tb_ref, w_ref, dout_ref,
                dw_ref, dtw_ref, dtb_ref, dbias_ref, *, patch):
    dt_dim = tw_ref.shape[-1]
    tw, tb = tw_ref[:], tb_ref[:]
    g = dout_ref[:]
    gb = g.astype(jnp.bfloat16)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        dtw_ref[:] = jnp.zeros_like(dtw_ref)
        dtb_ref[:] = jnp.zeros_like(dtb_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    dtw_acc = jnp.zeros((1, dt_dim), jnp.float32)
    dtb_acc = jnp.zeros((1, dt_dim), jnp.float32)
    for j in range(patch):
        dt_col = dt_ref[:, j : j + 1]
        v_col = valid_ref[:, j : j + 1]
        theta = dt_col * tw + tb
        sin_t, cos_t = _sincos(theta)
        phi = cos_t * v_col
        w_j = w_ref[j * dt_dim : (j + 1) * dt_dim, :]
        dw_ref[j * dt_dim : (j + 1) * dt_dim, :] += jnp.dot(
            phi.astype(jnp.bfloat16).T, gb, preferred_element_type=jnp.float32
        )
        dphi = jnp.dot(gb, w_j.astype(jnp.bfloat16).T,
                       preferred_element_type=jnp.float32)
        common = dphi * (-sin_t) * v_col
        dtw_acc = dtw_acc + (common * dt_col).sum(0, keepdims=True)
        dtb_acc = dtb_acc + common.sum(0, keepdims=True)
    dtw_ref[:] += dtw_acc
    dtb_ref[:] += dtb_acc
    dbias_ref[:] += g.sum(0, keepdims=True)


def _pad_rows(x, n):
    pad = n - x.shape[0]
    return x if pad == 0 else jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def time_channel_projection(dt, valid, tw, tb, w, bias, patch):
    """Fused masked-Phi patch projection.

    dt (M, L) f32 = t_query - t_entry; valid (M, L) f32 (pads 0); tw/tb
    (Dt,) TimeEncoder params; w (patch*Dt, ced) the proj_time kernel;
    bias (ced,). Returns (M, L//patch, ced) == patches(where(valid,
    Phi(dt), 0)) @ w + bias with identical bf16 matmul math.
    """
    return _fwd_impl(dt, valid, tw, tb, w, bias, patch)


def _slots(patch):
    """Slot-group size for the lane-aligned batched kernels (0 = legacy)."""
    return TC_SLOT if TC_SLOT > 1 and patch % TC_SLOT == 0 else 0


def _pad_params(tw, tb, w, patch):
    """Zero-pad Dt to a 128 multiple: (1, dtp) tw/tb and (patch*dtp, ced)
    w with zero rows at the pad lanes (exactness: Phi pads hit zero
    kernel rows)."""
    dt_dim = tw.shape[-1]
    dtp = _round_up(dt_dim, 128)
    pad = dtp - dt_dim
    twp = jnp.pad(tw.reshape(1, -1), ((0, 0), (0, pad)))
    tbp = jnp.pad(tb.reshape(1, -1), ((0, 0), (0, pad)))
    wp = jnp.pad(
        w.reshape(patch, dt_dim, -1), ((0, 0), (0, pad), (0, 0))
    ).reshape(patch * dtp, -1)
    return twp, tbp, wp, dtp


def _fwd_impl(dt, valid, tw, tb, w, bias, patch):
    m, l = dt.shape
    p = l // patch
    ced = w.shape[-1]
    rows = m * p
    rows_pad = _round_up(max(rows, BLK_P), BLK_P)
    slot = _slots(patch)
    dt_dim = tw.shape[-1]
    if slot:
        twp, tbp, wp, dtp = _pad_params(tw, tb, w, patch)
        kern = functools.partial(_fwd_kernel_slots, patch=patch, slot=slot)
    else:
        twp, tbp, wp, dtp = tw.reshape(1, -1), tb.reshape(1, -1), w, dt_dim
        kern = functools.partial(_fwd_kernel, patch=patch)
    args = (
        _pad_rows(dt.reshape(rows, patch), rows_pad),
        _pad_rows(valid.reshape(rows, patch), rows_pad),
        twp, tbp, wp, bias.reshape(1, -1),
    )
    row = lambda d: pl.BlockSpec((BLK_P, d), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(rows_pad // BLK_P,),
        in_specs=[
            row(patch), row(patch),
            full((1, dtp)), full((1, dtp)),
            full((patch * dtp, ced)), full((1, ced)),
        ],
        out_specs=row(ced),
        out_shape=jax.ShapeDtypeStruct((rows_pad, ced), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(*args)
    return out[:rows].reshape(m, p, ced)


def _fwd(dt, valid, tw, tb, w, bias, patch):
    return _fwd_impl(dt, valid, tw, tb, w, bias, patch), (dt, valid, tw, tb, w)


def _bwd(patch, res, dout):
    dt, valid, tw, tb, w = res
    m, l = dt.shape
    p = l // patch
    ced = w.shape[-1]
    rows = m * p
    rows_pad = _round_up(max(rows, BLK_P_BWD), BLK_P_BWD)
    dt_dim = tw.shape[-1]
    slot = _slots(patch)
    if slot:
        twp, tbp, wp, dtp = _pad_params(tw, tb, w, patch)
        kern = functools.partial(_bwd_kernel_slots, patch=patch, slot=slot)
    else:
        twp, tbp, wp, dtp = tw.reshape(1, -1), tb.reshape(1, -1), w, dt_dim
        kern = functools.partial(_bwd_kernel, patch=patch)
    args = (
        _pad_rows(dt.reshape(rows, patch), rows_pad),
        _pad_rows(valid.reshape(rows, patch), rows_pad),
        twp, tbp, wp,
        _pad_rows(dout.reshape(rows, ced), rows_pad),
    )
    row = lambda d: pl.BlockSpec((BLK_P_BWD, d), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    dw, dtw, dtb, dbias = pl.pallas_call(
        kern,
        grid=(rows_pad // BLK_P_BWD,),
        in_specs=[
            row(patch), row(patch),
            full((1, dtp)), full((1, dtp)),
            full((patch * dtp, ced)), row(ced),
        ],
        out_specs=(
            full((patch * dtp, ced)),
            full((1, dtp)), full((1, dtp)), full((1, ced)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((patch * dtp, ced), jnp.float32),
            jax.ShapeDtypeStruct((1, dtp), jnp.float32),
            jax.ShapeDtypeStruct((1, dtp), jnp.float32),
            jax.ShapeDtypeStruct((1, ced), jnp.float32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(*args)
    if slot:
        dw = dw.reshape(patch, dtp, ced)[:, :dt_dim, :].reshape(
            patch * dt_dim, ced
        )
        dtw, dtb = dtw[:, :dt_dim], dtb[:, :dt_dim]
    return (
        jnp.zeros_like(dt), jnp.zeros_like(valid),
        dtw.reshape(-1), dtb.reshape(-1), dw, dbias.reshape(-1),
    )


time_channel_projection.defvjp(_fwd, _bwd)


def time_channel_projection_reference(dt, valid, tw, tb, w, bias, patch):
    """Pure-XLA oracle with identical bf16 matmul math (parity tests)."""
    m, l = dt.shape
    p = l // patch
    phi = jnp.cos(dt[..., None] * tw + tb) * valid[..., None]
    x = phi.reshape(m * p, patch * tw.shape[-1])
    out = jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32) + bias
    return out.reshape(m, p, -1)
