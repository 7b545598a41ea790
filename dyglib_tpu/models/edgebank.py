"""EdgeBank: non-parametric link-prediction baseline (eval only).

Behavioral parity target: models/EdgeBank.py:7-121 — predict 1.0 iff
(src, dst) is in a memory set built from history. Memory modes:
  * unlimited: every edge seen (EdgeBank.py:26-35);
  * time_window + fixed_proportion: edges in the last ``proportion``
    quantile of history time (EdgeBank.py:51-53);
  * time_window + repeat_interval: window = (sum over recurring edges of
    their mean repeat interval) / number of DISTINCT edges
    (EdgeBank.py:55-68 — faithfully including the distinct-edge divisor);
  * repeat_threshold: edges with frequency >= mean frequency
    (EdgeBank.py:77-91).

Host-side (set algebra, eval only), vectorized with numpy/pandas instead of
the reference's Python dict loops. Training is forbidden for EdgeBank
(reference load_configs.py:60-61) — there is simply no trainable surface.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from ..data.containers import EdgeStream


def _pairs(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Encode (src, dst) pairs as int64 keys for vectorized set ops."""
    return src.astype(np.int64) << 32 | dst.astype(np.int64)


def edge_bank_unlimited_memory(src, dst) -> np.ndarray:
    return np.unique(_pairs(np.asarray(src), np.asarray(dst)))


def edge_bank_time_window_memory(
    src, dst, ts, time_window_mode: str, time_window_proportion: float
) -> np.ndarray:
    src, dst, ts = map(np.asarray, (src, dst, ts))
    if time_window_mode == "fixed_proportion":
        start = np.quantile(ts, 1 - time_window_proportion)
        end = ts.max()
    elif time_window_mode == "repeat_interval":
        keys = _pairs(src, dst)
        order = np.argsort(keys, kind="stable")
        k, t = keys[order], ts[order]
        # per-edge consecutive time gaps (input is chronological, and the
        # stable sort keeps each edge's occurrences in time order)
        same = k[1:] == k[:-1]
        gaps = t[1:] - t[:-1]
        # mean gap per recurring edge, summed; divided by DISTINCT edges
        df = pd.DataFrame({"k": k[1:][same], "g": gaps[same]})
        sum_means = df.groupby("k")["g"].mean().sum() if len(df) else 0.0
        n_distinct = len(np.unique(keys))
        avg = sum_means / n_distinct
        end = ts.max()
        start = end - avg
    else:
        raise ValueError(f"unknown time_window_mode {time_window_mode!r}")
    mask = (ts >= start) & (ts <= end)
    return edge_bank_unlimited_memory(src[mask], dst[mask])


def edge_bank_repeat_threshold_memory(src, dst) -> np.ndarray:
    keys = _pairs(np.asarray(src), np.asarray(dst))
    uniq, counts = np.unique(keys, return_counts=True)
    return uniq[counts >= counts.mean()]


def edge_bank_link_prediction(
    history_data: EdgeStream,
    positive_edges: tuple[np.ndarray, np.ndarray],
    negative_edges: tuple[np.ndarray, np.ndarray],
    edge_bank_memory_mode: str = "unlimited_memory",
    time_window_mode: str = "fixed_proportion",
    time_window_proportion: float = 0.15,
) -> tuple[np.ndarray, np.ndarray]:
    """Memory build + membership probabilities (EdgeBank.py:94-121)."""
    if edge_bank_memory_mode == "unlimited_memory":
        memory = edge_bank_unlimited_memory(history_data.src, history_data.dst)
    elif edge_bank_memory_mode == "time_window_memory":
        memory = edge_bank_time_window_memory(
            history_data.src, history_data.dst, history_data.ts,
            time_window_mode, time_window_proportion,
        )
    elif edge_bank_memory_mode == "repeat_threshold_memory":
        memory = edge_bank_repeat_threshold_memory(
            history_data.src, history_data.dst
        )
    else:
        raise ValueError(
            f"unknown edge_bank_memory_mode {edge_bank_memory_mode!r}"
        )

    def predict(edges):
        keys = _pairs(np.asarray(edges[0]), np.asarray(edges[1]))
        idx = np.searchsorted(memory, keys)
        idx = np.clip(idx, 0, max(len(memory) - 1, 0))
        if len(memory) == 0:
            return np.zeros(len(keys))
        return (memory[idx] == keys).astype(np.float64)

    return predict(positive_edges), predict(negative_edges)
