"""Standalone fwd/bwd timing of the gathered-attention kernel vs the
pure-XLA reference at the TGAT layer-1 operating shape.

Timing discipline: the measured unit is ONE jitted lax.scan program that
chains N data-dependent steps (same as scripts/measure_all_models.py) —
per-step dispatch and the tunnel's unreliable block_until_ready semantics
then cannot distort the per-step number.

Usage: python scripts/microbench_gathered.py [M] [K] [N_SCAN]
"""
import sys, time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from dyglib_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from dyglib_tpu.ops.pallas import gathered_attention as ga

M = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 20
N = int(sys.argv[3]) if len(sys.argv) > 3 else 16
Dn, De, Dt, Dq, H = 172, 172, 100, 272, 2

rng = np.random.RandomState(0)
q3 = jnp.asarray(rng.randn(M, Dq).astype(np.float32))
feat = jnp.asarray(rng.randn(M * K, Dn + De).astype(np.float32))
dt = jnp.asarray((rng.rand(M, K) * 5).astype(np.float32))
mask = jnp.asarray((rng.rand(M, K) > 0.3).astype(np.float32))
keep = jnp.ones((M, H, K), jnp.float32)
tw = jnp.asarray(rng.randn(Dt).astype(np.float32))
tb = jnp.asarray(rng.randn(Dt).astype(np.float32))
wk = jnp.asarray((rng.randn(Dn + De + Dt, Dq) * 0.1).astype(np.float32))
wv = jnp.asarray((rng.randn(Dn + De + Dt, Dq) * 0.1).astype(np.float32))


def bench(label, step):
    """step(q3, feat, dt, mask, keep, twb, wkv) -> (M, Dq) next carry."""

    @jax.jit
    def scanned(q3, feat, dt, mask, keep, twb, wkv):
        def body(c, _):
            out = step(c, feat, dt, mask, keep, twb, wkv)
            return 0.999 * c + 0.001 * out, out[0, 0]

        c, ys = jax.lax.scan(body, q3, None, length=N)
        return c, ys

    args = (q3, feat, dt, mask, keep, (tw, tb), (wk, wv))
    out = scanned(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(3):
        out = scanned(*args)
    jax.block_until_ready(out)
    dt_ms = (time.time() - t0) / (3 * N) * 1e3
    print(f"{label:>28}: {dt_ms:7.3f} ms/step", flush=True)
    return dt_ms


def fwd_k(c, feat, dt, mask, keep, twb, wkv):
    return ga.gathered_attention(c, feat, dt, mask, keep, twb, wkv, H)


def fwd_x(c, feat, dt, mask, keep, twb, wkv):
    return ga.gathered_attention_reference(c, feat, dt, mask, keep, twb, wkv, H)


def grad_step(fn):
    def step(c, feat, dt, mask, keep, twb, wkv):
        g = jax.grad(
            lambda q: (fn(q, feat, dt, mask, keep, twb, wkv, H) ** 2).sum()
        )(c)
        return g

    return step


bench("kernel fwd", fwd_k)
bench("xla fwd", fwd_x)
bench("kernel fwd+bwd", grad_step(ga.gathered_attention))
bench("xla fwd+bwd", grad_step(ga.gathered_attention_reference))
