"""Memory-model batch-saturation sweep (VERDICT r4 #5).

The ICI scaling argument claims sub-millisecond memory-model steps
(JODIE 0.55 ms at B=200) are latency-bound and that "their scaling story
is larger per-chip batches" — previously unmeasured beyond B=200. This
script sweeps TGN/JODIE/DyRep at B in {200, 2000, 20000} on a synthetic
graph sized so the state + feature working set stays resident, reports
ms/step + edges/s per point, and names the saturation batch (first B
whose edges/s is within 20% of the max).

Usage: python scripts/memory_saturation_sweep.py [model ...]
Env: SAT_JSON (path for the result table).
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dyglib_tpu.utils import enable_compilation_cache, use_fast_prng

enable_compilation_cache()
use_fast_prng()

from dyglib_tpu.data import get_link_prediction_data, write_synthetic_dataset
from dyglib_tpu.graph.csr import time_keys
from dyglib_tpu.models import MemoryModel, compute_src_dst_node_time_shifts
from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig

BATCHES = [200, 2000, 20000]
MODELS = ["TGN", "JODIE", "DyRep"]


def measure(name: str, data, shifts, B: int, n_scan: int) -> dict:
    train = data.train
    keys_all = time_keys(train.ts)
    kwargs = dict(model_name=name, time_shifts=shifts)
    if name != "JODIE":
        kwargs.update(num_neighbors=10, num_layers=1)
    tr = LinkPredictionTrainer(
        MemoryModel(**kwargs), data, TrainConfig(batch_size=B),
        os.path.join(tempfile.gettempdir(), "sat_ck.pkl"),
    )

    def batch_at(s):
        s = s % (train.num_interactions - B)
        return (
            jnp.asarray(train.src[s : s + B], jnp.int32),
            jnp.asarray(train.dst[s : s + B], jnp.int32),
            jnp.asarray(train.src[s : s + B], jnp.int32),
            jnp.asarray(train.dst[::-1][s : s + B], jnp.int32),
            jnp.asarray(keys_all[s : s + B], jnp.int32),
            jnp.asarray(train.eid[s : s + B], jnp.int32),
            jnp.ones((B,), jnp.float32),
        )

    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[batch_at(i * B) for i in range(n_scan)]
    )
    scan_keys = jax.vmap(
        lambda i: jax.random.fold_in(jax.random.PRNGKey(0), i)
    )(jnp.arange(n_scan))
    out = tr.init_params(0) + (tr.init_state(),)
    for _ in range(2):  # two-warmup discipline (BASELINE.md round 1)
        res = tr.train_epoch_scan_fn(*out, tr.train_csr, stacked, scan_keys)
        jax.block_until_ready(res)
        out = res[:3]
    dts = []
    for _ in range(3):
        t0 = time.time()
        res = tr.train_epoch_scan_fn(*out, tr.train_csr, stacked, scan_keys)
        jax.block_until_ready(res)
        out = res[:3]
        dts.append((time.time() - t0) / n_scan)
    dt = sorted(dts)[1]
    return {
        "ms_per_step": round(dt * 1e3, 3),
        "edges_per_s": round(B / dt, 1),
        "spread_pct": round(100 * (max(dts) - min(dts)) / dt, 1),
    }


def main():
    models = sys.argv[1:] or MODELS
    tmp = os.path.join(tempfile.gettempdir(), "sat_ws")
    # graph large enough that B=20000 batches see diverse nodes, small
    # enough that the (N, 172) memory + features stay far below HBM
    if not os.path.exists(os.path.join(tmp, "sat")):
        write_synthetic_dataset(
            tmp, "sat", num_src=40000, num_dst=10000, num_edges=800000,
            seed=11,
        )
    data = get_link_prediction_data("sat", data_root=tmp)
    shifts = compute_src_dst_node_time_shifts(
        data.train.src, data.train.dst, data.train.ts
    )
    out = {}
    for name in models:
        out[name] = {}
        for B in BATCHES:
            n_scan = max(4, min(32, 160000 // B))
            r = measure(name, data, shifts, B, n_scan)
            out[name][str(B)] = r
            print(
                f"{name:>6} B={B:>6}: {r['ms_per_step']:8.3f} ms/step  "
                f"{r['edges_per_s']:>10,.0f} edges/s  "
                f"(spread {r['spread_pct']}%)", flush=True,
            )
        best = max(v["edges_per_s"] for v in out[name].values())
        sat = next(
            b for b in map(str, BATCHES)
            if out[name][b]["edges_per_s"] >= 0.8 * best
        )
        out[name]["saturation_batch"] = int(sat)
        print(f"{name:>6} saturates at B={sat} "
              f"(peak {best:,.0f} edges/s)", flush=True)
    path = os.environ.get("SAT_JSON")
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
