import sys, os, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from dyglib_tpu.data import get_link_prediction_data, write_synthetic_dataset
from dyglib_tpu.graph.csr import time_keys
from dyglib_tpu.models import DyGFormer
from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig
import optax

root = "/tmp/bench_ws/data"
if not os.path.exists(os.path.join(root, "wiki")):
    write_synthetic_dataset(root, "wiki", num_src=8227, num_dst=1000, num_edges=157474, seed=1)
data = get_link_prediction_data("wiki", data_root=root)
train = data.train; keys_all = time_keys(train.ts)
b = 1024
backbone = DyGFormer(max_input_sequence_length=32, patch_size=1, num_layers=2)
tr = LinkPredictionTrainer(backbone, data, TrainConfig(batch_size=b), "/tmp/bench_ws/ck.pkl")
params, opt_state = tr.init_params(0)

NSTEP = 10
def multi_step(params, opt_state, csr, batches, key):
    def one(carry, batch):
        params, opt_state = carry
        def loss_fn(p):
            loss, probs, _ = tr._forward(p, csr, tr.tables, batch, key, True, None, True)
            return loss, probs
        (loss, probs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tr.optim.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss
    (params, opt_state), losses = jax.lax.scan(one, (params, opt_state), batches)
    return params, opt_state, losses

def batch_at(s):
    s = s % (train.num_interactions - b)
    return (jnp.asarray(train.src[s:s+b], jnp.int32), jnp.asarray(train.dst[s:s+b], jnp.int32),
            jnp.asarray(train.src[s:s+b], jnp.int32), jnp.asarray(train.dst[::-1][s:s+b], jnp.int32),
            jnp.asarray(keys_all[s:s+b], jnp.int32), jnp.asarray(train.eid[s:s+b], jnp.int32),
            jnp.ones((b,), jnp.float32))
stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[batch_at(i*b) for i in range(NSTEP)])
jms = jax.jit(multi_step)
p, o, losses = jms(params, opt_state, tr.train_csr, stacked, jax.random.PRNGKey(0))
jax.block_until_ready(losses)
t0 = time.time()
for rep in range(5):
    p, o, losses = jms(p, o, tr.train_csr, stacked, jax.random.fold_in(jax.random.PRNGKey(0), rep))
jax.block_until_ready(losses)
dt = (time.time()-t0)/(5*NSTEP)
print(f"scan-of-{NSTEP} B={b}: {dt*1e3:.1f} ms/step -> {b/dt:.0f} edges/s")
