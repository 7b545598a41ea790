"""Pallas TPU kernel: per-row co-occurrence counting.

counts[r, i] = |{ j : q_ids[r, i] == k_ids[r, j] }|

This is DyGFormer's NeighborCooccurrenceEncoder hot op
(reference DyGFormer.py:337-393, a per-row np.unique + dict loop; SURVEY
marks it ★HOT). The kernel tiles the computation through VMEM: each
program owns a (TR, TQ) query block and streams the key row in TK chunks,
so peak live memory is O(TR * TQ * TK) regardless of L.

MEASURED VERDICT (TPU v5e, R=400): XLA fuses the jnp broadcast-compare
into its reduction without materializing the (R, L, L) tensor and runs it
at 1.4 ms (L=512) / 2.6 ms (L=2048) vs this kernel's 1.6 / 7.5 ms — the
XLA path is already at speed-of-light for these shapes, so the models use
the jnp formulation and this kernel is retained as a verified alternative
implementation (and the harness for future int8/fused variants).

Counts are integers cast to float; gradients never flow through them
(inputs are int ids), so no custom VJP is needed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR = 8  # rows per program (sublane tile)
TQ = 128  # query columns per program (lane tile)
TK = 256  # key chunk streamed per loop iteration


def _kernel(q_ref, k_ref, out_ref, *, seq_len: int):
    q = q_ref[:]  # (TR, TQ) int32
    tk = min(TK, seq_len)
    steps = seq_len // tk
    rem = seq_len - steps * tk

    def body(c, acc):
        kblk = k_ref[:, pl.ds(c * tk, tk)]  # (TR, tk)
        eq = (q[:, :, None] == kblk[:, None, :]).astype(jnp.float32)
        return acc + eq.sum(axis=2)

    acc = jax.lax.fori_loop(0, steps, body, jnp.zeros((TR, TQ), jnp.float32))
    if rem:
        kblk = k_ref[:, pl.ds(steps * tk, rem)]
        eq = (q[:, :, None] == kblk[:, None, :]).astype(jnp.float32)
        acc = acc + eq.sum(axis=2)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def cooccurrence_counts(
    q_ids: jnp.ndarray, k_ids: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """(R, Lq) x (R, Lk) int ids -> (R, Lq) float32 match counts.

    Rows and columns are padded to tile multiples internally; id 0 is NOT
    treated specially here (callers zero pad positions afterwards, matching
    the reference's post-hoc zeroing, DyGFormer.py:387-391).
    """
    assert q_ids.ndim == 2 and k_ids.ndim == 2
    assert q_ids.shape[0] == k_ids.shape[0]
    r, lq = q_ids.shape
    lk = k_ids.shape[1]

    rp = (r + TR - 1) // TR * TR
    lqp = (lq + TQ - 1) // TQ * TQ
    q = jnp.full((rp, lqp), -1, jnp.int32).at[:r, :lq].set(q_ids.astype(jnp.int32))
    # pad keys with -2 so padded queries (-1) never match padded keys
    k = jnp.full((rp, lk), -2, jnp.int32).at[:r, :].set(k_ids.astype(jnp.int32))

    out = pl.pallas_call(
        functools.partial(_kernel, seq_len=lk),
        out_shape=jax.ShapeDtypeStruct((rp, lqp), jnp.float32),
        grid=(rp // TR, lqp // TQ),
        in_specs=[
            pl.BlockSpec((TR, TQ), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, lk), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TR, TQ), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(q, k)
    return out[:r, :lq]


def cooccurrence_counts_reference(
    q_ids: jnp.ndarray, k_ids: jnp.ndarray
) -> jnp.ndarray:
    """jnp formulation (materializes (R, Lq, Lk)); used below the size
    threshold and as the kernel's correctness oracle."""
    eq = q_ids[:, :, None] == k_ids[:, None, :]
    return eq.astype(jnp.float32).sum(axis=2)
