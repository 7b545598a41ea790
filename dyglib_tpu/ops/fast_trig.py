"""Fast-math cosine/sine for time-feature encoders (round 4).

XLA's TPU cos/sin spend ~36 cycles/element on extended-precision range
reduction (Payne-Hanek-grade, needed for exactness at huge arguments).
The time encoders Phi(dt) = cos(dt*w + b) evaluate hundreds of millions
of these per step (the time-channel kernel measured ~80% cosine;
BASELINE.md round 4). This module provides the cheap alternative:
Cody-Waite two-term reduction mod 2*pi + degree-14/15 Taylor
polynomials (~15 VPU ops).

Accuracy contract:
  * |theta| <~ 2.6e4 (k < 2^12, where k*C1 is exact in f32): abs error
    <= ~1e-4 — below the bf16 rounding every Phi consumer applies.
  * larger theta: reduction error grows to ~3e-2 at theta ~ 1e6 — but
    there f32's OWN input quantization (ulp(theta) ~ 0.06 rad at 1e6)
    already exceeds it, i.e. the "exact" phase of the rounded f32 theta
    carries no more information than the fast one. End-metric neutrality
    measured on-chip (BASELINE.md round 4: best val AP 0.9482 fast vs
    0.9471 exact at the calibration operating point).

Gate: enabled() reads DYGLIB_FAST_TRIG in {"0", "1", "auto"} (default
auto = ON only on the TPU backend). CPU parity tests therefore always
exercise the exact torch-matching jnp.cos path; explicit "1" forces the
fast path for testing it off-TPU.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_INV2PI = 0.15915494309189535
_C1 = 6.28125  # 2*pi split: C1 exact in 12 significand bits
_C2 = 0.0019353071795864769  # 2*pi - C1 (to f64 accuracy)
# Taylor coefficients through r^14 (cos) / r^15 (sin): remainder <= 5e-7
# (cos) / 3e-7 (sin) at |r| = pi after reduction
COS_P = (1.0, -0.5, 1 / 24.0, -1 / 720.0, 1 / 40320.0, -1 / 3628800.0,
         1 / 479001600.0, -1 / 87178291200.0)
SIN_P = (1.0, -1 / 6.0, 1 / 120.0, -1 / 5040.0, 1 / 362880.0,
         -1 / 39916800.0, 1 / 6227020800.0, -1 / 1307674368000.0)


def enabled() -> bool:
    mode = os.environ.get("DYGLIB_FAST_TRIG", "auto")
    if mode == "auto":
        return jax.default_backend() == "tpu"
    return mode == "1"


def reduce_2pi(x):
    k = jnp.round(x * _INV2PI)
    r = (x - k * _C1) - k * _C2
    # Beyond |x| ~ 5e7 the k*_C1 rounding error alone exceeds pi, so r
    # lands outside the polynomial's convergence range and the Taylor
    # series diverges without bound (measured |fast_cos| ~ 1e18 at
    # x = 1e9 before this clamp).  There the phase of the f32 input is
    # pure quantization noise anyway, so any bounded value is as good
    # as any other — clamp so outputs stay in [-1, 1]+O(1e-5) for every
    # finite input.  The bound is 3.2, NOT pi: a correct reduction can
    # land a few f32 ulps beyond +-pi (k*_C1 rounding), and clamping
    # those to exactly pi would perturb sin near its zero by ~1e-4; the
    # polynomials still converge at |r| = 3.2 (Taylor remainder ~ 6e-6).
    return jnp.clip(r, -3.2, 3.2)


def poly_even(r2, coeffs):
    acc = jnp.float32(coeffs[-1])
    for c in coeffs[-2::-1]:
        acc = acc * r2 + jnp.float32(c)
    return acc


def fast_cos(x):
    r = reduce_2pi(x)
    return poly_even(r * r, COS_P)


def fast_sincos(x):
    """(sin x, cos x) sharing one range reduction."""
    r = reduce_2pi(x)
    r2 = r * r
    return r * poly_even(r2, SIN_P), poly_even(r2, COS_P)


def cos(x):
    """jnp.cos or the fast path, by the DYGLIB_FAST_TRIG gate."""
    return fast_cos(x) if enabled() else jnp.cos(x)
