"""Vectorized temporal neighbor sampling on device.

TPU-native replacement for the reference NeighborSampler
(utils/utils.py:130-273): every operation is a fixed-shape, jit-compatible
batch primitive — a segment binary search (the per-row
``np.searchsorted`` of find_neighbors_before, utils/utils.py:141) followed
by gathers. No Python loops, no host round-trips, no dynamic shapes.

All device times are int32 keys (see TemporalCSR time contract) so window
comparisons and time sorts are exact for every reference dataset.

Semantics preserved from the reference:
  * neighbor visibility is strictly-before (t' < t);
  * ``recent`` returns the last K interactions RIGHT-ALIGNED with zero
    padding at the front (utils/utils.py:200-209);
  * ``uniform`` samples K with replacement then re-sorts by time
    (utils/utils.py:184-199);
  * ``time_interval_aware`` samples K with replacement from softmax of the
    precomputed CAWN logits over the visible window then re-sorts by time
    (utils/utils.py:176-199); an all-underflowed window degrades to uniform
    exactly like torch.softmax over constant logits;
  * empty windows yield all-zero rows (id 0 = padding sentinel).

RNG parity note: stochastic strategies match the reference in distribution,
not in bitstream (SURVEY §7 "RNG parity"); ``recent`` is exact.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .csr import FEAT_ENTRY_PAD, TemporalCSR


class NeighborBlock(NamedTuple):
    """Fixed-K sampled neighborhood; rows are time-sorted where valid."""

    nbr: jnp.ndarray  # (..., K) int32, 0 where padded
    eid: jnp.ndarray  # (..., K) int32, 0 where padded
    ts: jnp.ndarray  # (..., K) int32 time keys, 0 where padded
    mask: jnp.ndarray  # (..., K) bool, True on real samples


def window_bounds(
    csr: TemporalCSR, node_ids: jnp.ndarray, times: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(lo, hi) flat-index bounds of each node's strictly-before-t history.

    hi is the left insertion point of t in the node's time-sorted segment —
    identical to np.searchsorted(times[node], t) in find_neighbors_before
    (utils/utils.py:141).
    """
    node_ids = node_ids.astype(jnp.int32)
    lo = csr.offsets[node_ids]
    seg_hi = csr.offsets[node_ids + 1]
    t = times.astype(jnp.int32)

    # statically UNROLLED bisection (ceil(log2(max_degree))+1 steps —
    # the search range is one node's segment, so the bound is the max
    # segment length, not num_entries): on TPU a
    # lax.fori_loop of tiny bodies pays per-iteration loop sequencing that
    # dominated CAWN's sampling time; straight-line ops fuse into a handful
    # of kernels instead
    lo_, hi_ = lo, seg_hi
    for _ in range(csr.segment_bisect_steps):
        mid = (lo_ + hi_) >> 1
        below = csr.ts[jnp.clip(mid, 0, csr.num_entries - 1)] < t
        active = lo_ < hi_
        lo_ = jnp.where(active & below, mid + 1, lo_)
        hi_ = jnp.where(active & ~below, mid, hi_)
    return lo, hi_


def _gather_rows(
    csr: TemporalCSR, idx: jnp.ndarray, valid: jnp.ndarray
) -> tuple[NeighborBlock, jnp.ndarray | None]:
    """(block, next-hop hi bounds) for the sampled flat indices.

    One packed row gather instead of 3-4 scalar gathers: on TPU a (Q, 4)
    row gather is ~4.6x cheaper than the per-array scalar gathers it
    replaces (scripts/microbench_gather.py), and it yields the nbr_hi
    column (next-hop window bound) for free.
    """
    safe = jnp.clip(idx, 0, csr.num_entries - 1)
    if csr.pack is not None:
        rows = csr.pack[safe]  # (..., 4)
        block = NeighborBlock(
            nbr=jnp.where(valid, rows[..., 0], 0),
            eid=jnp.where(valid, rows[..., 1], 0),
            ts=jnp.where(valid, rows[..., 2], 0),
            mask=valid,
        )
        return block, rows[..., 3]
    block = NeighborBlock(
        nbr=jnp.where(valid, csr.nbr[safe], 0),
        eid=jnp.where(valid, csr.eid[safe], 0),
        ts=jnp.where(valid, csr.ts[safe], 0),
        mask=valid,
    )
    nhi = None if csr.nbr_hi is None else csr.nbr_hi[safe]
    return block, nhi


def _gather(csr: TemporalCSR, idx: jnp.ndarray, valid: jnp.ndarray) -> NeighborBlock:
    return _gather_rows(csr, idx, valid)[0]


def _recent_indices(
    csr: TemporalCSR, lo: jnp.ndarray, hi: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Flat indices of the last k window entries, right-aligned
    (utils/utils.py:200-209)."""
    idx = hi[..., None] - k + jnp.arange(k, dtype=jnp.int32)
    return idx, idx >= lo[..., None]


def _uniform_indices(
    csr: TemporalCSR, lo: jnp.ndarray, hi: jnp.ndarray, k: int, key: jax.Array
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k uniform draws with replacement, re-sorted by time
    (utils/utils.py:184-199). Rows are all-valid or all-padded."""
    cnt = hi - lo
    r = jax.random.randint(key, lo.shape + (k,), 0, jnp.maximum(cnt, 1)[..., None])
    idx = _sort_indices_by_time(csr, lo[..., None] + r)
    return idx, jnp.broadcast_to((cnt > 0)[..., None], idx.shape)


def _tia_indices(
    csr: TemporalCSR, lo: jnp.ndarray, hi: jnp.ndarray, k: int, key: jax.Array
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k draws from softmax of CAWN tia logits over the window, time-sorted.

    Inverse-CDF sampling on the precomputed per-segment cumsum of
    exp(logits) (csr.tia_cew): softmax normalization over the window slice
    cancels, so a binary search on the cumulative weights reproduces the
    reference's torch.softmax + np.random.choice (utils/utils.py:176-191).
    """
    assert csr.tia_cew is not None, "CSR built without time_interval_aware weights"
    cnt = hi - lo
    nonempty = cnt > 0

    cew = csr.tia_cew
    # lo is ALWAYS a segment start (offsets[node], in both the direct and
    # the precomputed-bounds call patterns), so the window's cumulative
    # weight base is exactly 0 — cew is a PER-SEGMENT cumsum
    base = jnp.zeros(lo.shape, cew.dtype)
    total = cew[jnp.clip(hi - 1, 0, csr.num_entries - 1)] - base
    degenerate = total <= 0.0  # all weights underflowed -> uniform fallback

    key_u, key_f = jax.random.split(key)
    u = jax.random.uniform(key_u, lo.shape + (k,))
    target = base[..., None] + u * total[..., None]

    # first j in [lo, hi) with cew[j] > target — statically unrolled
    # bisection (see window_bounds for why not fori_loop)
    lo_b = jnp.broadcast_to(lo[..., None], target.shape)
    hi_b = jnp.broadcast_to(hi[..., None], target.shape)

    # range is one node's window, so the max-segment-length bound applies
    lo_, hi_ = lo_b, hi_b
    for _ in range(csr.segment_bisect_steps):
        mid = (lo_ + hi_) >> 1
        below = cew[jnp.clip(mid, 0, csr.num_entries - 1)] <= target
        active = lo_ < hi_
        lo_ = jnp.where(active & below, mid + 1, lo_)
        hi_ = jnp.where(active & ~below, mid, hi_)
    j = lo_
    idx = jnp.clip(j, lo_b, jnp.maximum(hi_b - 1, lo_b))

    fallback = lo[..., None] + jax.random.randint(
        key_f, lo.shape + (k,), 0, jnp.maximum(cnt, 1)[..., None]
    )
    idx = _sort_indices_by_time(csr, jnp.where(degenerate[..., None], fallback, idx))
    return idx, jnp.broadcast_to(nonempty[..., None], idx.shape)


def _sort_indices_by_time(csr: TemporalCSR, idx: jnp.ndarray) -> jnp.ndarray:
    """Stable re-sort of drawn flat indices by entry time
    (utils/utils.py:193-199).

    Rows of stochastic draws are fully valid or fully padded, so pads never
    interleave with real entries; flat indices within one node's segment
    sort by time exactly as the times themselves (segments are time-sorted,
    and equal times keep draw order via the stable flat-index tiebreak).
    """
    return jnp.sort(idx, axis=-1)


def _sampled_indices(
    csr: TemporalCSR,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    k: int,
    strategy: str,
    key: jax.Array | None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    if strategy == "recent":
        return _recent_indices(csr, lo, hi, k)
    if strategy == "uniform":
        assert key is not None
        return _uniform_indices(csr, lo, hi, k, key)
    if strategy == "time_interval_aware":
        assert key is not None
        return _tia_indices(csr, lo, hi, k, key)
    raise ValueError(f"unknown sample_neighbor_strategy {strategy!r}")


def sample_recent(
    csr: TemporalCSR, node_ids: jnp.ndarray, times: jnp.ndarray, k: int
) -> NeighborBlock:
    """Most recent k interactions, right-aligned (utils/utils.py:200-209)."""
    lo, hi = window_bounds(csr, node_ids, times)
    return _gather(csr, *_recent_indices(csr, lo, hi, k))


def sample_uniform(
    csr: TemporalCSR,
    node_ids: jnp.ndarray,
    times: jnp.ndarray,
    k: int,
    key: jax.Array,
) -> NeighborBlock:
    """k uniform draws with replacement, re-sorted by time (utils/utils.py:184-199)."""
    lo, hi = window_bounds(csr, node_ids, times)
    return _gather(csr, *_uniform_indices(csr, lo, hi, k, key))


def sample_time_interval_aware(
    csr: TemporalCSR,
    node_ids: jnp.ndarray,
    times: jnp.ndarray,
    k: int,
    key: jax.Array,
) -> NeighborBlock:
    """k draws from softmax of CAWN tia logits over the window, time-sorted
    (see _tia_indices)."""
    lo, hi = window_bounds(csr, node_ids, times)
    return _gather(csr, *_tia_indices(csr, lo, hi, k, key))


def sample_neighbors(
    csr: TemporalCSR,
    node_ids: jnp.ndarray,
    times: jnp.ndarray,
    k: int,
    strategy: str = "recent",
    key: jax.Array | None = None,
) -> NeighborBlock:
    """Strategy dispatch mirroring get_historical_neighbors (utils/utils.py:149-214)."""
    lo, hi = window_bounds(csr, node_ids, times)
    return _gather(csr, *_sampled_indices(csr, lo, hi, k, strategy, key))


def sample_multi_hop(
    csr: TemporalCSR,
    node_ids: jnp.ndarray,
    times: jnp.ndarray,
    k: int,
    num_hops: int,
    strategy: str = "recent",
    key: jax.Array | None = None,
    return_windows: bool = False,
) -> list[NeighborBlock] | tuple[list[NeighborBlock], list[jnp.ndarray] | None]:
    """Recursive fan-out: hop h has shape (B, k**h) (utils/utils.py:216-252).

    Hop h+1 queries are the flattened ids/times of hop h; padded entries
    (id 0, t 0) naturally produce empty windows and stay padded.

    Hop h+1 window bounds come from the precomputed per-entry bound table
    (csr.nbr_hi) when available — one gather per row instead of a
    log2(E)-step bisection over the B*k**h fan-out, which dominated TGAT's
    and CAWN's sampling cost.

    ``return_windows``: additionally return the per-hop flat window BASE
    arrays (start = hi - k, shape = that hop's query shape) for the
    'recent' strategy, whose sampled indices are exactly start + j — the
    contiguous ranges the window-fetch feature path
    (fetch_entry_windows) consumes. None for stochastic strategies.
    """
    blocks: list[NeighborBlock] = []
    wins: list[jnp.ndarray] = []
    b = node_ids.shape[0]
    lo, hi = window_bounds(csr, node_ids, times)
    for h in range(num_hops):
        sub = None if key is None else jax.random.fold_in(key, h)
        idx, valid = _sampled_indices(csr, lo, hi, k, strategy, sub)
        if strategy == "recent":
            wins.append(hi - k)
        blk, nhi = _gather_rows(csr, idx, valid)
        blocks.append(blk)
        if h + 1 == num_hops:
            break
        nids = blk.nbr.reshape(b, -1)
        lo = csr.offsets[nids]
        if csr.nbr_hi is not None and nhi is not None:
            hi = jnp.where(valid.reshape(b, -1), nhi.reshape(b, -1), lo)
        else:
            _, hi = window_bounds(csr, nids, blk.ts.reshape(b, -1))
    if return_windows:
        return blocks, (wins if strategy == "recent" else None)
    return blocks


def fetch_entry_windows(
    csr: TemporalCSR, start: jnp.ndarray, k: int
) -> jnp.ndarray:
    """(..., k, Dn+De) rows of csr.feat_entry for contiguous windows.

    ``start``: flat window base per query (hi - k from the 'recent'
    sampler; may be negative by up to k — absorbed by the table's zero
    guard rows, so row j is EXACTLY entry start+j, bit-aligned with
    _recent_indices). Invalid positions return guard zeros or other
    entries' rows; callers mask with the block's validity mask, which
    reproduces the row-gather path's id-0 zero rows exactly.

    Lowering note (measured, scripts/trace_ops.py): the obvious
    vmap(dynamic_slice) formulation lowers to an XLA gather with
    slice_sizes=(k, D) that runs PATHOLOGICALLY slowly inside the jitted
    train step — 20.9 ms/step at the TGAT operating point, 63% of the
    whole step, ~16 GB/s effective (the standalone microbenchmark of the
    same op hits full bandwidth, which is how it shipped unnoticed).
    A flat ROW gather over start+j indices is latency-bound at ~7 ns/row
    but predictable, and consecutive rows of one window coalesce.
    """
    assert csr.feat_entry is not None, "CSR built without feat_entry"
    from .csr import feat_entry_guard_pad

    table = csr.feat_entry
    pad = feat_entry_guard_pad(csr)
    assert k <= pad, f"window k={k} exceeds feat_entry guard pad {pad}"
    d = table.shape[1]
    flat = start.reshape(-1).astype(jnp.int32) + pad
    idx = flat[:, None] + jnp.arange(k, dtype=jnp.int32)
    win = table[idx]  # (Q, k, D) row gather
    return win.reshape(start.shape + (k, d))
