"""Tiny numpy oracles re-stating reference semantics for parity tests.

Written fresh from the behavioral spec in SURVEY.md §2.2 (reference
utils/utils.py:130-214): per-row searchsorted window + recent/uniform
selection. Used only by tests.
"""
import numpy as np


class OracleAdjacency:
    """Per-node time-sorted adjacency built the reference way."""

    def __init__(self, src, dst, eid, ts, num_nodes):
        self.nbr = [[] for _ in range(num_nodes)]
        self.eid = [[] for _ in range(num_nodes)]
        self.ts = [[] for _ in range(num_nodes)]
        for s, d, e, t in zip(src, dst, eid, ts):
            self.nbr[s].append(d); self.eid[s].append(e); self.ts[s].append(t)
            self.nbr[d].append(s); self.eid[d].append(e); self.ts[d].append(t)
        self.nbr = [np.array(x, dtype=np.int64) for x in self.nbr]
        self.eid = [np.array(x, dtype=np.int64) for x in self.eid]
        self.ts = [np.array(x, dtype=np.float64) for x in self.ts]
        # input stream is chronological, so per-node lists are time-sorted

    def window(self, node, t):
        i = np.searchsorted(self.ts[node], t)
        return self.nbr[node][:i], self.eid[node][:i], self.ts[node][:i]

    def recent(self, node_ids, times, k):
        """Right-aligned last-k window entries, zero-padded at the front."""
        b = len(node_ids)
        out_n = np.zeros((b, k), dtype=np.int64)
        out_e = np.zeros((b, k), dtype=np.int64)
        out_t = np.zeros((b, k), dtype=np.float32)
        for r, (n, t) in enumerate(zip(node_ids, times)):
            wn, we, wt = self.window(n, t)
            wn, we, wt = wn[-k:], we[-k:], wt[-k:]
            if len(wn):
                out_n[r, k - len(wn):] = wn
                out_e[r, k - len(we):] = we
                out_t[r, k - len(wt):] = wt
        return out_n, out_e, out_t
