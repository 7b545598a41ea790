"""Device-resident temporal adjacency in CSR form.

TPU-native replacement for the reference's Python list-of-arrays adjacency
(utils/utils.py:73-110, 283-302). The undirected temporal graph is stored as
three flat arrays (`nbr`, `eid`, `ts`) plus `offsets`, with each node's
segment sorted by interaction time — the same per-node ordering the
reference produces by appending every edge to both endpoints' lists in
chronological order and stable-sorting by time.

For the `time_interval_aware` strategy (CAWN, utils/utils.py:112-128) we
additionally precompute the reference's per-position sampling logits
v_i = exp(a*(t_i - t_last)) / cumsum_j<=i exp(a*(t_j - t_last)) (NaN -> -1e10)
and store the per-segment inclusive cumsum of exp(v_i), so that device-side
sampling is an inverse-CDF binary search — softmax over the visible window
slice is exactly what the reference applies at sample time
(utils/utils.py:180-183).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..data.containers import EdgeStream


class TemporalCSR(NamedTuple):
    """Time-sorted undirected CSR adjacency (all arrays device-resident).

    Time contract: device times are int32. Every reference dataset uses
    integer-valued timestamps (seconds or days, up to ~1.6e8 for LastFM —
    beyond float32's 2^24 exact-integer range), so int32 keys make
    strictly-before visibility and all time deltas BIT-EXACT on device;
    float32 appears only after the delta subtraction, mirroring the
    reference's float64-numpy-then-.float() pipeline (e.g. TGAT.py:116-119).
    Non-integer streams are ceil-quantized at build with the same contract.
    """

    offsets: jnp.ndarray  # (N+1,) int32 — segment boundaries per node id
    nbr: jnp.ndarray  # (M,) int32 — neighbor node ids
    eid: jnp.ndarray  # (M,) int32 — edge ids
    ts: jnp.ndarray  # (M,) int32 — interaction times (sorted per segment)
    tia_cew: Optional[jnp.ndarray] = None  # (M,) f32 — cumsum(exp(tia logits))
    # (M, D) f32 — per-segment INCLUSIVE prefix sums of the neighbors' raw
    # node features along the flat CSR order. Any contiguous window's
    # feature sum is then two gathers: sum([lo2, hi)) = feat_prefix[hi-1]
    # - feat_prefix[lo2-1] (0 when lo2 is the segment start). Built on
    # demand for models whose hot path is a windowed feature mean over the
    # `recent` strategy (GraphMixer's time_gap node encoder), turning a
    # (B, time_gap, D) gather+reduce into O(1) per query.
    feat_prefix: Optional[jnp.ndarray] = None
    # (M,) int32 — for entry e = (u -> v at time t): the flat index of the
    # left insertion point of t in v's segment, i.e. the strictly-before
    # window of the NEXT-hop query (v, t) is [offsets[v], nbr_hi[e]).
    # Precomputing it turns every multi-hop window_bounds bisection (the
    # dominant sampling cost at hop fan-outs of B*K rows) into one gather.
    nbr_hi: Optional[jnp.ndarray] = None
    # (M, 4) int32 [nbr, eid, ts, nbr_hi] — the same entry data packed into
    # rows. On TPU one row gather of 4 lanes costs LESS than one scalar
    # gather from a flat array (measured: 2.3 ms vs 3.0 ms for 320k indices;
    # 3 separate scalar gathers cost 10.8 ms), so the sampling hot path
    # reads this and the flat arrays serve bisection / prefix lookups. The
    # duplication costs 16 B/entry of HBM — accepted for the ~4x sample
    # speedup (scripts/microbench_gather.py).
    pack: Optional[jnp.ndarray] = None
    # Static bisection bound carried as a placeholder array's LENGTH (a
    # NamedTuple pytree cannot hold a plain int without it being traced):
    # per-segment binary searches converge in ceil(log2(max_degree))+1
    # steps, far fewer than the log2(num_entries) worst case — each step is
    # a 25k-lane scalar gather on the sampling hot path, so the bound cut
    # CAWN's tia inverse-CDF search ~2x (scripts/trace_ops.py).
    seg_steps: Optional[jnp.ndarray] = None  # (steps,) int8 placeholder
    # (pad + M + pad + node_rows, width) f32 — per-ENTRY packed
    # [node_feat[nbr[i]] || edge_feat[eid[i]]] rows in flat CSR order,
    # with >= FEAT_ENTRY_PAD zero guard rows on each side (recover the
    # pad with feat_entry_guard_pad) and a trailing per-NODE
    # [node_feat[i] || 0] block for full-sequence consumers
    # (round 5; see build_temporal_csr). The 'recent' strategy's
    # sampled windows are CONTIGUOUS flat ranges [hi-k, hi), so with this
    # table the per-hop feature fetch is Q slice-gathers of (k, D)
    # contiguous rows instead of Q*k independent row gathers — row gathers
    # are LATENCY-bound on TPU (~6 ns/row = ~220 GB/s regardless of row
    # width, xprof-measured), while contiguous slices stream at HBM
    # bandwidth. Costs (Dn+De)*4 bytes per entry of HBM (duplicates node
    # features per occurrence), so it is built on demand under a byte
    # budget; consumers fall back to row gathers without it.
    feat_entry: Optional[jnp.ndarray] = None
    # (S, T, 128) f32 — the SAME per-entry packed rows in 128-lane SLAB
    # layout (slab s holds lanes [s*128, (s+1)*128) of the packed row).
    # Built instead of feat_entry for consumers whose fetch is the
    # window-DMA kernel (ops/pallas/window_fetch.py): Mosaic supports
    # row-granular DMA at DYNAMIC UNALIGNED row starts ONLY for
    # single-lane-tile (<=128-lane) arrays (probed round 5 — wider arrays
    # fail "tile index divisible by 8"), and a static lane-offset concat
    # of S slabs inside VMEM is free, while a sublane->lane repack is not.
    feat_entry_slabs: Optional[jnp.ndarray] = None
    # (Dn,) int8 placeholder: its LENGTH is the node-feature width of
    # feat_entry's packed rows (same pytree-static-int trick as seg_steps)
    feat_entry_ndim: Optional[jnp.ndarray] = None
    # (De,) int8 placeholder: edge-feature width. feat_entry's lane dim is
    # zero-PADDED up to a multiple of 128 (Dn+De=344 -> 384) because the
    # fused window-attention kernel DMAs tiled HBM slices, which must be
    # (8, 128)-aligned; consumers slice [:, :Dn] / [:, Dn:Dn+De]
    feat_entry_edim: Optional[jnp.ndarray] = None

    @property
    def feat_entry_node_dim(self) -> int:
        assert self.feat_entry_ndim is not None
        return self.feat_entry_ndim.shape[0]

    @property
    def feat_entry_edge_dim(self) -> int:
        assert self.feat_entry_edim is not None
        return self.feat_entry_edim.shape[0]

    @property
    def num_nodes(self) -> int:
        return self.offsets.shape[0] - 1

    @property
    def num_entries(self) -> int:
        return self.nbr.shape[0]

    @property
    def segment_bisect_steps(self) -> int:
        """Unroll count for per-segment binary searches (see seg_steps)."""
        if self.seg_steps is not None:
            return self.seg_steps.shape[0]
        import math

        m = max(int(self.num_entries), 2)
        return max(1, int(math.ceil(math.log2(m))) + 1)


# zero guard rows on each side of feat_entry: window starts hi-k can be
# negative by up to k, and dynamic_slice must never clamp (clamping would
# misalign rows against the sampler's right-aligned indices). Bounds every
# supported window size for the window-fetch path.
FEAT_ENTRY_PAD = 512


def feat_entry_guard_pad(csr) -> int:
    """Guard rows on each side of csr.feat_entry / feat_entry_slabs
    (layout [guard(pad) | entries(m) | guard(pad) | node_rows]; the node
    block is num_nodes rounded up to 8 plus 8 slack rows — see
    build_temporal_csr)."""
    rows = (
        csr.feat_entry.shape[0]
        if csr.feat_entry is not None
        else csr.feat_entry_slabs.shape[1]
    )
    n_rows = -(-csr.num_nodes // 8) * 8 + 8
    return (rows - csr.num_entries - n_rows) // 2


def build_temporal_csr(
    stream: EdgeStream,
    num_nodes: int | None = None,
    time_scaling_factor: float = 0.0,
    with_tia: bool = False,
    feat_prefix_of: Optional[np.ndarray] = None,
    feat_entry_of: Optional[tuple[np.ndarray, np.ndarray]] = None,
    feat_entry_pad: int = FEAT_ENTRY_PAD,
    feat_entry_layout: str = "packed",
) -> TemporalCSR:
    """Host-side CSR construction from a chronological edge stream.

    Entry order within each node's segment matches the reference adjacency
    build (utils/utils.py:96-103): chronological, with ties broken by edge
    order and the src-side entry of an edge preceding its dst-side entry.
    """
    if num_nodes is None:
        num_nodes = int(max(stream.src.max(), stream.dst.max())) + 1

    # native tier: O(E) single-pass counting sort (dyglib_tpu/native);
    # falls back to the numpy interleave + stable argsort (O(E log E))
    # when no host toolchain is available — identical output either way
    # (tests/test_native_csr.py)
    from ..native import build_temporal_csr_native

    native = build_temporal_csr_native(
        stream.src, stream.dst, stream.eid, stream.ts, num_nodes
    )
    if native is not None:
        offsets, peer, eid, ts = native
    else:
        e = stream.num_interactions
        node = np.empty(2 * e, dtype=np.int64)
        peer = np.empty(2 * e, dtype=np.int64)
        eid = np.empty(2 * e, dtype=np.int64)
        ts = np.empty(2 * e, dtype=np.float64)
        # interleave so per-edge append order (src, then dst entry) survives
        node[0::2], node[1::2] = stream.src, stream.dst
        peer[0::2], peer[1::2] = stream.dst, stream.src
        eid[0::2] = eid[1::2] = stream.eid
        ts[0::2] = ts[1::2] = stream.ts

        order = np.argsort(node, kind="stable")  # chronological per node
        peer, eid, ts = peer[order], eid[order], ts[order]

        counts = np.bincount(node, minlength=num_nodes)
        offsets = np.zeros(num_nodes + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])

    tia_cew = None
    if with_tia:
        tia_cew = _tia_cumulative_weights(offsets, ts, time_scaling_factor)

    # per-entry next-hop window bound: the flat arrays are sorted by the
    # composite key (node, time-key), so one global searchsorted of every
    # entry's (nbr, time-key) gives offsets[nbr] + local left insertion
    keys = time_keys(ts)
    n_nodes = len(offsets) - 1
    seg_node = np.repeat(np.arange(n_nodes, dtype=np.int64), np.diff(offsets))
    composite = (seg_node << 32) | keys
    nbr_hi = np.searchsorted(
        composite, (np.asarray(peer, np.int64) << 32) | keys, side="left"
    )

    feat_prefix = None
    if feat_prefix_of is not None:
        feat_prefix = _segment_feature_prefix(offsets, peer, feat_prefix_of)

    feat_entry = None
    if feat_entry_of is not None:
        node_f, edge_f = feat_entry_of
        m = len(peer)
        dn, de = node_f.shape[1], edge_f.shape[1]
        # lane dim padded to the 128 tiling so the fused window-attention
        # kernel can DMA (8,128)-aligned slices of this table
        width = -(-(dn + de) // 128) * 128
        # the guard pad must cover the largest window a consumer fetches
        # (DyGFormer maxlen can reach 2048, best_configs CanParl); the
        # actual pad is recoverable from shapes as
        # (feat_entry.shape[0] - num_entries) // 2, which is what
        # fetch_entry_windows uses — no extra field needed
        pad = max(int(feat_entry_pad), FEAT_ENTRY_PAD)
        # layout: [guard(pad) | entries(m) | guard(pad) | node_rows(N)].
        # The trailing per-NODE block holds [node_feat[i] || 0] rows so a
        # full-sequence consumer (DyGFormer) fetches target row 0 AND the
        # neighbor window in ONE gather — invalid window positions are
        # index-redirected to guard row 0 (zeros), so no output-tensor
        # masking pass is ever needed. pad stays recoverable from shapes:
        # (rows - m - num_nodes) // 2.
        # num_nodes rounded up to 8 (+8 slack) keeps every 8-row-granular
        # access of the trailing node block inside the table
        n_rows = -(-num_nodes // 8) * 8 + 8
        feat_entry = np.zeros((pad + m + pad + n_rows, width), np.float32)
        feat_entry[pad : pad + m, :dn] = node_f[peer]
        feat_entry[pad : pad + m, dn : dn + de] = edge_f[eid]
        feat_entry[2 * pad + m : 2 * pad + m + num_nodes, :dn] = (
            node_f[:num_nodes]
        )

    feat_entry_slabs = None
    if feat_entry is not None and feat_entry_layout == "slabs":
        # 128-lane slab layout for the window-DMA fetch kernel (see the
        # TemporalCSR.feat_entry_slabs comment); replaces the packed table
        feat_entry_slabs = np.ascontiguousarray(
            feat_entry.reshape(feat_entry.shape[0], -1, 128).transpose(1, 0, 2)
        )
        feat_entry = None

    pack = np.stack(
        [
            np.asarray(peer, np.int32),
            np.asarray(eid, np.int32),
            keys.astype(np.int32),
            nbr_hi.astype(np.int32),
        ],
        axis=1,
    )
    return TemporalCSR(
        offsets=jnp.asarray(offsets, dtype=jnp.int32),
        nbr=jnp.asarray(peer, dtype=jnp.int32),
        eid=jnp.asarray(eid, dtype=jnp.int32),
        ts=jnp.asarray(keys, dtype=jnp.int32),
        tia_cew=None if tia_cew is None else jnp.asarray(tia_cew, jnp.float32),
        feat_prefix=None
        if feat_prefix is None
        else jnp.asarray(feat_prefix, jnp.float32),
        nbr_hi=jnp.asarray(nbr_hi, dtype=jnp.int32),
        pack=jnp.asarray(pack),
        seg_steps=jnp.zeros((_segment_steps(offsets),), jnp.int8),
        feat_entry=None if feat_entry is None else jnp.asarray(feat_entry),
        feat_entry_slabs=None
        if feat_entry_slabs is None
        else jnp.asarray(feat_entry_slabs),
        feat_entry_ndim=None
        if feat_entry_of is None
        else jnp.zeros((feat_entry_of[0].shape[1],), jnp.int8),
        feat_entry_edim=None
        if feat_entry_of is None
        else jnp.zeros((feat_entry_of[1].shape[1],), jnp.int8),
    )


def _segment_steps(offsets: np.ndarray) -> int:
    """Bisection unroll bound: ceil(log2(max segment length)) + 1."""
    import math

    max_deg = int(np.max(np.diff(offsets))) if len(offsets) > 1 else 1
    return max(1, int(math.ceil(math.log2(max(max_deg, 2)))) + 1)


def _segment_feature_prefix(
    offsets: np.ndarray, peer: np.ndarray, node_features: np.ndarray
) -> np.ndarray:
    """(M, D) inclusive per-segment prefix sums of peer node features.

    Accumulated in float64 on host, stored float32: the downstream
    subtraction feat_prefix[hi-1] - feat_prefix[lo2-1] then carries only
    one f32 rounding per entry (per-segment reset keeps magnitudes at
    ~sqrt(degree), so cancellation error stays ~1e-6 relative — validated
    against the direct gather in tests/test_graphmixer.py).
    """
    m = len(peer)
    feats = np.asarray(node_features, dtype=np.float64)[peer]  # (M, D)
    cs = np.cumsum(feats, axis=0)
    n = len(offsets) - 1
    seg_id = np.repeat(np.arange(n), np.diff(offsets))
    start = np.asarray(offsets)[seg_id]  # segment start per flat index
    base = np.where((start > 0)[:, None], cs[np.maximum(start, 1) - 1], 0.0)
    return (cs - base).astype(np.float32)


def time_keys(ts: np.ndarray) -> np.ndarray:
    """Integer time keys for exact device-side comparisons.

    Integer-valued streams (all reference datasets) map exactly; non-integer
    times are ceil'd, which preserves strictly-before semantics for integer
    event times and blurs only sub-unit gaps.
    """
    keys = np.ceil(np.asarray(ts, dtype=np.float64))
    assert keys.size == 0 or keys.max() < 2**31, "timestamps exceed int32 range"
    return keys.astype(np.int64)


def _tia_cumulative_weights(
    offsets: np.ndarray, ts: np.ndarray, alpha: float
) -> np.ndarray:
    """Per-segment cumsum of exp(v_i) with v_i the reference tia logits.

    v_i = exp(a*dt_i) / cumsum_j<=i exp(a*dt_j), dt relative to the node's
    LAST interaction (utils/utils.py:112-128); 0/0 positions -> -1e10, whose
    exp underflows to 0 exactly as torch.softmax treats them at sample time.

    Fully vectorized: segment-local cumsums are global cumsums minus the
    value accumulated before each segment start.
    """
    m = len(ts)
    if m == 0:
        return np.zeros(0, dtype=np.float32)
    n = len(offsets) - 1
    seg_id = np.repeat(np.arange(n), np.diff(offsets))

    def seg_cumsum(x: np.ndarray) -> np.ndarray:
        cs = np.cumsum(x)
        start = offsets[seg_id]  # first flat index of each element's segment
        base = cs[start] - x[start]  # cumsum strictly before the segment
        return cs - base

    seg_last = ts[offsets[seg_id + 1] - 1]  # node's last interaction time
    ew = np.exp(alpha * (ts - seg_last))
    wcs = seg_cumsum(ew)
    with np.errstate(invalid="ignore", divide="ignore"):
        v = np.where(wcs > 0, ew / wcs, -1e10)
    return seg_cumsum(np.exp(v)).astype(np.float32)
