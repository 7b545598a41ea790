"""Pod-scale host-path + step-time check: 1M nodes / 10M edges.

Times every trainer-construction stage (the host-side scaling story) and
the TGN fused-scan step on the real chip (the step-time-flat-in-N claim:
view_rows makes the memory ops O(gathered rows), not O(N)).

Edges are generated directly with numpy (the synthetic CSV generator has
a per-edge Python loop, unusable at 10M).

Usage: python scripts/large_graph_bench.py [num_edges] [num_nodes]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

E = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
B = 200
N_SCAN = 32
FEAT = 172       # node feature dim = memory dim (the reference contract)
# edge features at 50 dims: the full 172-dim 10M-row table is 6.9 GB and
# pushes the whole working set to 20.4 GB (> 15.75 GB HBM, measured OOM);
# the scaling claim under test is the memory-op cost in N, which edge
# feature width does not touch
FEAT_EDGE = 50

t0 = time.time()
rng = np.random.RandomState(0)
src = rng.randint(1, N // 2, size=E).astype(np.int64)
dst = (N // 2 + rng.randint(0, N - N // 2, size=E)).astype(np.int64)
ts = np.sort(rng.randint(1, 2**31 - 1, size=E)).astype(np.float64)
eid = np.arange(1, E + 1, dtype=np.int64)
label = np.zeros(E)
print(f"generate {E} edges: {time.time()-t0:.1f}s", flush=True)

from dyglib_tpu.data.containers import EdgeStream

stream = EdgeStream(src=src, dst=dst, ts=ts, eid=eid, label=label)

from dyglib_tpu.models import compute_src_dst_node_time_shifts

t0 = time.time()
shifts = compute_src_dst_node_time_shifts(src, dst, ts)
t_shifts = time.time() - t0
print(f"time shifts (vectorized): {t_shifts:.1f}s", flush=True)

from dyglib_tpu.native import build_temporal_csr_native, native_available

t_native = None
if native_available():
    t0 = time.time()
    build_temporal_csr_native(src, dst, eid, ts.astype(np.float64), N + 1)
    t_native = time.time() - t0
    print(f"native C++ CSR build: {t_native:.1f}s", flush=True)

from dyglib_tpu.graph import build_temporal_csr

t0 = time.time()
csr = build_temporal_csr(stream, num_nodes=N + 1)
t_csr = time.time() - t0
print(f"full device CSR (incl. pack/nbr_hi/device put): {t_csr:.1f}s",
      flush=True)

# ---- TGN step time at 1M nodes (edge features sized to fit HBM: the
# working set must fit v5e's 15.75 GB HBM — see FEAT_EDGE note)
import jax

from dyglib_tpu.utils import enable_compilation_cache, use_fast_prng

enable_compilation_cache()
use_fast_prng()
import jax.numpy as jnp

from dyglib_tpu.data.datasets import LinkPredictionData
from dyglib_tpu.graph.csr import time_keys
from dyglib_tpu.models import MemoryModel
from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig

node_feats = np.zeros((N + 1, FEAT), np.float32)
edge_feats = rng.normal(size=(E + 1, FEAT_EDGE)).astype(np.float32)

n_train = int(E * 0.7)
cut = lambda s: EdgeStream(
    src=src[:s], dst=dst[:s], ts=ts[:s], eid=eid[:s], label=label[:s]
)
t0 = time.time()
data = LinkPredictionData(
    node_raw_features=node_feats,
    edge_raw_features=edge_feats,
    full=stream,
    train=cut(n_train),
    val=EdgeStream(src=src[n_train:], dst=dst[n_train:], ts=ts[n_train:],
                   eid=eid[n_train:], label=label[n_train:]),
    test=cut(100),
    new_node_val=cut(100),
    new_node_test=cut(100),
)
tr = LinkPredictionTrainer(
    MemoryModel(model_name="TGN", num_neighbors=10, num_layers=1,
                time_shifts=shifts),
    data, TrainConfig(batch_size=B), "/tmp/large_ck.pkl",
)
t_trainer = time.time() - t0
print(f"trainer construction (incl. both CSRs + tables to device): "
      f"{t_trainer:.1f}s", flush=True)

train = data.train
keys_all = time_keys(train.ts)


def batch_at(s):
    s = s % (train.num_interactions - B)
    sl = slice(s, s + B)
    return (
        jnp.asarray(train.src[sl], jnp.int32),
        jnp.asarray(train.dst[sl], jnp.int32),
        jnp.asarray(train.src[sl], jnp.int32),
        jnp.asarray(train.dst[::-1][sl], jnp.int32),
        jnp.asarray(keys_all[sl], jnp.int32),
        jnp.asarray(train.eid[sl], jnp.int32),
        jnp.ones((B,), jnp.float32),
    )


stacked = jax.tree_util.tree_map(
    lambda *xs: jnp.stack(xs), *[batch_at(i * B) for i in range(N_SCAN)]
)
keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(0), i))(
    jnp.arange(N_SCAN)
)
out = tr.init_params(0) + (tr.init_state(),)
for i in range(2):
    t0 = time.time()
    res = tr.train_epoch_scan_fn(*out, tr.train_csr, stacked, keys)
    jax.block_until_ready(res[3])
    out = res[:3]
    print(f"warmup {i}: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
res = tr.train_epoch_scan_fn(*out, tr.train_csr, stacked, keys)
jax.block_until_ready(res[3])
dt = (time.time() - t0) / N_SCAN
print(
    f"TGN @ {N} nodes / {E} edges: {dt*1e3:.2f} ms/step | "
    f"{B/dt:.0f} edges/s",
    flush=True,
)
