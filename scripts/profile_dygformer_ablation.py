import sys, os, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from dyglib_tpu.data import get_link_prediction_data, write_synthetic_dataset
from dyglib_tpu.graph.csr import time_keys
from dyglib_tpu.models import DyGFormer
from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig

root = "/tmp/bench_ws/data"
data = get_link_prediction_data("wiki", data_root=root)
train = data.train; keys_all = time_keys(train.ts)
b = 1024

def measure(backbone, label):
    tr = LinkPredictionTrainer(backbone, data, TrainConfig(batch_size=b), "/tmp/bench_ws/ck.pkl")
    params, opt_state = tr.init_params(0)
    def batch_at(s):
        s = s % (train.num_interactions - b)
        return (jnp.asarray(train.src[s:s+b], jnp.int32), jnp.asarray(train.dst[s:s+b], jnp.int32),
                jnp.asarray(train.src[s:s+b], jnp.int32), jnp.asarray(train.dst[::-1][s:s+b], jnp.int32),
                jnp.asarray(keys_all[s:s+b], jnp.int32), jnp.asarray(train.eid[s:s+b], jnp.int32),
                jnp.ones((b,), jnp.float32))
    batches = [batch_at(i*b) for i in range(10)]
    p, o = params, opt_state
    for i in range(3):
        p, o, st, loss, _ = tr.train_step(p, o, None, tr.train_csr, batches[i], jax.random.PRNGKey(0))
    jax.block_until_ready(loss)
    t0 = time.time()
    for i in range(15):
        p, o, st, loss, _ = tr.train_step(p, o, None, tr.train_csr, batches[i%10], jax.random.fold_in(jax.random.PRNGKey(0), i))
    jax.block_until_ready(loss)
    dt = (time.time()-t0)/15
    # flops estimate from compiled executable
    lowered = jax.jit(tr.eval_step).lower(p, None, tr.train_csr, batches[0], jax.random.PRNGKey(0))
    ca = lowered.compile().cost_analysis()
    fl = ca.get("flops", 0) if ca else 0
    print(f"{label}: {dt*1e3:.1f} ms/step | eval-flops {fl/1e9:.1f} G")

measure(DyGFormer(max_input_sequence_length=32, patch_size=1, num_layers=2), "L2 full")
measure(DyGFormer(max_input_sequence_length=32, patch_size=1, num_layers=0), "L0 (no transformer)")
measure(DyGFormer(max_input_sequence_length=32, patch_size=4, num_layers=2), "L2 patch4 (8 patches)")
