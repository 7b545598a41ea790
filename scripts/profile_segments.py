"""Train-step segment timing: sample / forward / fwd+bwd / full step.

Usage: python scripts/profile_segments.py [model]
  model in {dygformer, cawn, tgat, graphmixer, tcl} (default dygformer)

Each segment runs as a fused 32-iteration lax.scan at B=200 (the bench
operating point), so per-step dispatch never touches the tunnel. Segment
costs come out by subtraction.
"""
import sys, os, time, tempfile

sys.path.insert(0, "/root/repo")
import jax

from dyglib_tpu.utils import enable_compilation_cache, use_fast_prng

enable_compilation_cache()
use_fast_prng()
import jax.numpy as jnp
import optax

from dyglib_tpu.data import get_link_prediction_data, write_synthetic_dataset
from dyglib_tpu.graph.csr import time_keys
from dyglib_tpu.models import CAWN, DyGFormer, GraphMixer, TCL, TGAT
from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig

B = 200
N_SCAN = 32
root = os.path.join(tempfile.gettempdir(), "allmodels_ws")
if not os.path.exists(os.path.join(root, "wiki")):
    write_synthetic_dataset(root, "wiki", num_src=8227, num_dst=1000,
                            num_edges=157474, seed=1)
data = get_link_prediction_data("wiki", data_root=root)
train = data.train
keys_all = time_keys(train.ts)

MODELS = {
    "dygformer": lambda: DyGFormer(max_input_sequence_length=32, patch_size=1,
                                   num_layers=2),
    "cawn": lambda: CAWN(num_neighbors=32, walk_length=1, num_walk_heads=8),
    "tgat": lambda: TGAT(num_neighbors=20, num_layers=2),
    "graphmixer": lambda: GraphMixer(num_neighbors=20, num_layers=2),
    "tcl": lambda: TCL(num_neighbors=20, num_layers=2),
}
backbone = MODELS[sys.argv[1] if len(sys.argv) > 1 else "dygformer"]()
tr = LinkPredictionTrainer(
    backbone, data, TrainConfig(batch_size=B), os.path.join(root, "ck.pkl")
)
params, opt_state = tr.init_params(0)


def batch_at(s):
    s = s % (train.num_interactions - B)
    return (
        jnp.asarray(train.src[s:s+B], jnp.int32),
        jnp.asarray(train.dst[s:s+B], jnp.int32),
        jnp.asarray(train.src[s:s+B], jnp.int32),
        jnp.asarray(train.dst[::-1][s:s+B], jnp.int32),
        jnp.asarray(keys_all[s:s+B], jnp.int32),
        jnp.asarray(train.eid[s:s+B], jnp.int32),
        jnp.ones((B,), jnp.float32),
    )


stacked = jax.tree_util.tree_map(
    lambda *xs: jnp.stack(xs), *[batch_at(i * B) for i in range(N_SCAN)]
)
keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(0), i))(
    jnp.arange(N_SCAN)
)
csr = tr.train_csr


def seg_sample(params, opt_state, csr, stacked, keys):
    def body(carry, inp):
        batch, key = inp
        src, dst, ns, nd, ts, eid, valid = batch
        ids4 = jnp.concatenate([src, dst, ns, nd])
        ts4 = jnp.tile(ts, 4)
        inputs = backbone.sample(csr, ids4, ts4, key)
        tot = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(inputs))
        return carry, tot.astype(jnp.float32)

    return jax.lax.scan(body, 0.0, (stacked, keys))


def seg_forward(params, opt_state, csr, stacked, keys):
    def body(carry, inp):
        batch, key = inp
        loss, probs, _, _ = tr._forward(params, csr, tr.tables, batch, key, True, None, False)
        return carry, loss

    return jax.lax.scan(body, 0.0, (stacked, keys))


def seg_grad(params, opt_state, csr, stacked, keys):
    def body(carry, inp):
        batch, key = inp

        def loss_fn(p):
            loss, probs, _, _ = tr._forward(p, csr, tr.tables, batch, key, True, None, False)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        gsum = sum(
            jnp.sum(jnp.abs(g)) for g in jax.tree_util.tree_leaves(grads)
        )
        return carry, loss + 0.0 * gsum

    return jax.lax.scan(body, 0.0, (stacked, keys))


def seg_full(params, opt_state, csr, stacked, keys):
    def body(carry, inp):
        params, opt_state = carry
        batch, key = inp

        def loss_fn(p):
            loss, probs, _, _ = tr._forward(p, csr, tr.tables, batch, key, True, None, False)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tr.optim.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, opt_state), losses = jax.lax.scan(
        body, (params, opt_state), (stacked, keys)
    )
    return params, opt_state, losses


for name, fn in (
    ("sample", seg_sample),
    ("forward", seg_forward),
    ("fwd+bwd", seg_grad),
    ("full", seg_full),
):
    jf = jax.jit(fn)
    out = jf(params, opt_state, csr, stacked, keys)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[-1])
    t0 = time.time()
    for _ in range(3):
        out = jf(params, opt_state, csr, stacked, keys)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[-1])
    dt = (time.time() - t0) / (3 * N_SCAN)
    print(f"{name:>8}: {dt*1e3:7.2f} ms/step | {B/dt:8.0f} edges/s", flush=True)
