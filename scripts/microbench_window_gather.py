"""Microbench: per-row gathers vs contiguous-window slice gathers.

The sampler's 'recent' windows are contiguous CSR entry ranges, so a
feature table stored in CSR-ENTRY order can be fetched as Q windows of
(K, D) contiguous rows instead of Q*K independent row gathers. This
measures both on the real chip, plus the Pallas DMA variant, to decide
the feature-fetch architecture (ROADMAP item 1 / round-1 VERDICT #3).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

from dyglib_tpu.utils import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

E = 315_000  # ~2E CSR entries at Wikipedia scale
D = 344  # node_feat + edge_feat packed per entry
K = 20
Q = 12_600  # hop-1 entries issuing hop-2 windows
ROWS = Q * K  # total rows fetched either way

rng = np.random.default_rng(0)
table = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))
row_idx = jnp.asarray(rng.integers(0, E, size=(ROWS,)).astype(np.int32))
starts = jnp.asarray(rng.integers(0, E - K, size=(Q,)).astype(np.int32))


@jax.jit
def row_gather(table, idx):
    return table[idx]


@jax.jit
def window_gather(table, starts):
    # one (K, D) contiguous slice per start — lowers to a gather with
    # slice_sizes=(K, D)
    return jax.vmap(lambda s: jax.lax.dynamic_slice(table, (s, 0), (K, D)))(starts)


@jax.jit
def window_gather_idx(table, starts):
    # expanded-index formulation (what the sampler currently emits):
    # idx[q, j] = start[q] + j, then a row gather — does XLA see contiguity?
    idx = starts[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
    return table[idx]


def bench(fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    bytes_moved = ROWS * D * 4
    return dt * 1e3, bytes_moved / dt / 1e9


for name, fn, args in [
    ("row_gather   (Q*K rows)", row_gather, (table, row_idx)),
    ("window_slice (Q windows)", window_gather, (table, starts)),
    ("window_idx   (Q,K idx)", window_gather_idx, (table, starts)),
]:
    ms, gbps = bench(fn, *args)
    print(f"{name}: {ms:7.3f} ms  {gbps:7.1f} GB/s")
