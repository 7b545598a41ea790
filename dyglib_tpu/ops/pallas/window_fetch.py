"""DMA block-copy fetch of contiguous entry-table windows (round 5).

DyGFormer's 'recent' histories are CONTIGUOUS ranges of the CSR entry
table (models/dygformer.py::sample), and its feature fetch is the largest
single item of the CanParl step: 1.65 GB of feature rows at 212 GB/s =
10.3 ms via XLA row gathers (BASELINE.md round 4 trace). Row gathers are
LATENCY-bound (~7 ns/row at 172 lanes; measured ~3x worse at 384 lanes —
the round-5 wide-row gather experiment lost 39.7 -> 60 ms/step), so the
row-at-a-time formulation cannot stream no matter how rows are packed.
This kernel replaces ~1.23M row descriptors with ~M * S * (L/TILE) block
DMAs of TILE contiguous rows each, which amortize to HBM bandwidth.

Function: ``fetch_sequence_features(slabs, tgt_rows, starts, counts, L)``
consumes the table in 128-lane SLAB layout (csr.feat_entry_slabs,
(S, T, 128)) and returns ``(M, L, S*128)`` where
  * row 0      = table[tgt_rows[m]]            (the target node's row),
  * row 1 + j  = table[starts[m] + j]  for j < counts[m],
  * remaining rows are zero.
Exactly the tensor DyGFormer's gather path builds, so kernel-vs-gather
parity is bitwise.

Mosaic facts this build rests on (probed on this toolchain, round 5):
row-granular DMA slices of an HBM ref at DYNAMIC UNALIGNED row starts
compile and copy exactly — but ONLY for single-lane-tile (<=128-lane)
arrays; wider arrays fail "tile index divisible by 8" (their HBM layout
is lane-tile-blocked, so an unaligned row range is not one stride). The
(8, 128) alignment restriction that shaped the round-2 window-attention
kernel applies to that case and to VECTOR loads, not to narrow-array
DMAs. Hence the slab layout: S unaligned single-slab DMAs per tile plus
a static lane-offset concat in VMEM (free; it is the sublane->lane
repack that is forbidden).

No VJP: the fetched rows feed the frozen node/edge channel projections
whose input cotangents are discarded (the feature tables are not
trainable), and JAX never differentiates through sample().
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flat_id(m, t, n_tiles):
    return m * n_tiles + t


def _kernel(tgt_ref, start_ref, count_ref, slabs_ref, out_ref,
            win_scratch, tgt_scratch, sems, tsems,
            *, tile: int, s: int, n_tiles: int):
    """Double-buffered across grid steps: program (m, t) waits on the DMAs
    program (m, t-1) started for it, then starts the NEXT program's DMAs
    before doing its own masked copy — the window fetch for step p+1 rides
    under step p's VMEM copy + out-block writeback."""
    m = pl.program_id(0)
    t = pl.program_id(1)
    count = count_ref[m]
    fid = _flat_id(m, t, n_tiles)
    slot = jax.lax.rem(fid, 2)

    def win_src(mm, tt):
        start = start_ref[mm]
        # out row r (global r = tt*tile + i, r >= 1) maps to table row
        # start + r - 1; row 0 is the target's row (separate DMA)
        return jnp.where(tt == 0, start, start + tt * tile - 1)

    def win_dma(si, mm, tt, sl):
        return pltpu.make_async_copy(
            slabs_ref.at[si, pl.ds(win_src(mm, tt), tile), :],
            win_scratch.at[sl, si],
            sems.at[sl, si],
        )

    def tgt_dma(si, mm, sl):
        return pltpu.make_async_copy(
            slabs_ref.at[si, pl.ds(tgt_ref[mm], 1), :],
            tgt_scratch.at[sl, si],
            tsems.at[sl, si],
        )

    def start_all(mm, tt, sl):
        for si in range(s):
            win_dma(si, mm, tt, sl).start()

        @pl.when(tt == 0)
        def _():
            for si in range(s):
                tgt_dma(si, mm, sl).start()

    @pl.when(fid == 0)
    def _warmup():
        start_all(m, t, slot)

    # prefetch the next program's window while this one is consumed
    @pl.when(fid + 1 < pl.num_programs(0) * n_tiles)
    def _prefetch():
        nxt = fid + 1
        nm = jax.lax.div(nxt, n_tiles)
        nt = jax.lax.rem(nxt, n_tiles)
        start_all(nm, nt, jax.lax.rem(nxt, 2))

    for si in range(s):
        win_dma(si, m, t, slot).wait()

    r_global = (
        jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + t * tile
    )

    @pl.when(t == 0)
    def _first_tile():
        valid = r_global[1:] - 1 < count
        for si in range(s):
            out_ref[0, 1:tile, si * 128 : (si + 1) * 128] = jnp.where(
                valid, win_scratch[slot, si, 0 : tile - 1, :], 0.0
            )
        for si in range(s):
            tgt_dma(si, m, slot).wait()
            out_ref[0, 0:1, si * 128 : (si + 1) * 128] = tgt_scratch[slot, si]

    @pl.when(t > 0)
    def _other_tiles():
        valid = r_global - 1 < count
        for si in range(s):
            out_ref[0, :, si * 128 : (si + 1) * 128] = jnp.where(
                valid, win_scratch[slot, si], 0.0
            )


@functools.partial(jax.jit, static_argnames=("seq_len", "tile", "interpret"))
def fetch_sequence_features(
    slabs: jnp.ndarray,
    tgt_rows: jnp.ndarray,
    starts: jnp.ndarray,
    counts: jnp.ndarray,
    seq_len: int,
    tile: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """(M, seq_len, S*128) sequence-feature rows via slab block DMAs (see
    module docstring). ``starts`` are absolute table rows (guard offset
    already applied); ``tgt_rows`` absolute rows of the per-node block."""
    m = starts.shape[0]
    s, t_rows, lanes = slabs.shape
    assert lanes == 128
    w = s * 128
    tile = min(tile, max(8, ((seq_len + 7) // 8) * 8))
    n_tiles = pl.cdiv(seq_len, tile)
    grid = (m, n_tiles)

    out = pl.pallas_call(
        functools.partial(_kernel, tile=tile, s=s, n_tiles=n_tiles),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # tgt_rows, starts, counts
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # slabs in HBM
            out_specs=pl.BlockSpec(
                (1, tile, w), lambda i, t, *_: (i, t, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, s, tile, 128), slabs.dtype),
                pltpu.VMEM((2, s, 1, 128), slabs.dtype),
                pltpu.SemaphoreType.DMA((2, s)),
                pltpu.SemaphoreType.DMA((2, s)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((m, n_tiles * tile, w), slabs.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * m * seq_len * w * slabs.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        tgt_rows.astype(jnp.int32),
        starts.astype(jnp.int32),
        counts.astype(jnp.int32),
        slabs,
    )
    return out[:, :seq_len, :]
