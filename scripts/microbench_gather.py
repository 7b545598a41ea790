"""Microbenchmark: 1-D scalar gathers vs packed row gathers on TPU.

Motivated by TGAT's sample segment costing 18 ms/step at B=200 (the hop-2
fan-out gathers ~1M scalars from flat int32 CSR arrays): measures which
gather formulation XLA lowers best on this chip.
"""
import sys, time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

M = 220_000  # CSR entries (wikipedia-scale train split, doubled edges)
Q = 320_000  # hop-2 fan-out at B=200 (800*20*20)
N_SCAN = 32

rng = np.random.default_rng(0)
nbr = jnp.asarray(rng.integers(0, 9000, M), jnp.int32)
eid = jnp.asarray(rng.integers(0, M // 2, M), jnp.int32)
ts = jnp.asarray(np.sort(rng.integers(0, 2**30, M)), jnp.int32)
packed = jnp.stack([nbr, eid, ts, ts], axis=1)  # (M, 4)
idx0 = jnp.asarray(rng.integers(0, M, (N_SCAN, Q)), jnp.int32)


def run(name, fn):
    jf = jax.jit(fn)
    out = jf(idx0)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(3):
        out = jf(idx0)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / (3 * N_SCAN)
    print(f"{name:>28}: {dt*1e3:8.3f} ms/step", flush=True)


def scan_of(body):
    def fn(idx):
        def step(c, i):
            return c, body(i)
        _, outs = jax.lax.scan(step, 0, idx)
        return jax.tree_util.tree_map(lambda x: x.sum(), outs)
    return fn


run("3x scalar gather", scan_of(lambda i: (nbr[i] + eid[i] + ts[i])))
run("1x scalar gather", scan_of(lambda i: nbr[i]))
run("packed (M,4) row gather", scan_of(lambda i: packed[i].sum(axis=-1)))
run("take_along sorted?? no-op", scan_of(lambda i: nbr[jnp.sort(i)]))
# bisect over ts: 18 unrolled steps of scalar gather + compare
def bisect(i):
    t = ts[i]  # pretend query times
    lo = jnp.zeros_like(i)
    hi = jnp.full_like(i, M)
    for _ in range(18):
        mid = (lo + hi) >> 1
        below = ts[jnp.clip(mid, 0, M - 1)] < t
        lo = jnp.where(below, mid + 1, lo)
        hi = jnp.where(below, hi, mid)
    return lo
run("18-step bisect", scan_of(bisect))
