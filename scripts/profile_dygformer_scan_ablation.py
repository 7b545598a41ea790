"""Component ablation of the DyGFormer train step, fused-scan timing.

Measures the scan-epoch program (no per-step host dispatch) on the real
chip across architectural variants to attribute step cost. Usage:
    python scripts/profile_dygformer_scan_ablation.py [B]
"""
import sys, os, time, tempfile

sys.path.insert(0, "/root/repo")
import jax

from dyglib_tpu.utils import enable_compilation_cache, use_fast_prng

enable_compilation_cache()
use_fast_prng()
import jax.numpy as jnp

from dyglib_tpu.data import get_link_prediction_data, write_synthetic_dataset
from dyglib_tpu.graph.csr import time_keys
from dyglib_tpu.models import DyGFormer
from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig

B = int(sys.argv[1]) if len(sys.argv) > 1 else 200
root = os.path.join(tempfile.gettempdir(), "dygf_ablation")
if not os.path.exists(os.path.join(root, "wiki")):
    write_synthetic_dataset(root, "wiki", num_src=8227, num_dst=1000,
                            num_edges=157474, seed=1)
data = get_link_prediction_data("wiki", data_root=root)
train = data.train
keys_all = time_keys(train.ts)


def measure(backbone, label, n_scan=64):
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
        lambda *xs: jnp.stack(xs), *[batch_at(i * B) for i in range(n_scan)]
    )
    keys = jax.vmap(
        lambda i: jax.random.fold_in(jax.random.PRNGKey(0), i)
    )(jnp.arange(n_scan))
    out = (params, opt_state, None)
    for _ in range(2):  # compile + donation-layout respecialization
        res = tr.train_epoch_scan_fn(*out, tr.train_csr, stacked, keys)
        jax.block_until_ready(res[3])
        out = res[:3]
    t0 = time.time()
    res = tr.train_epoch_scan_fn(*out, tr.train_csr, stacked, keys)
    jax.block_until_ready(res[3])
    dt = (time.time() - t0) / n_scan
    print(f"{label}: {dt*1e3:.2f} ms/step | {B/dt:.0f} edges/s", flush=True)


def mk(**kw):
    base = dict(max_input_sequence_length=32, patch_size=1, num_layers=2)
    base.update(kw)
    return DyGFormer(**base)
measure(mk(), "L2 ced50 f32 (default)")
measure(mk(num_layers=0), "L0 (no transformer)")
measure(mk(dropout=0.0), "L2 dropout=0")
measure(mk(compute_dtype="bfloat16"), "L2 bf16")
measure(mk(channel_embedding_dim=64), "L2 ced64 (128-aligned attn dim 256)")
measure(mk(channel_embedding_dim=64, compute_dtype="bfloat16"), "L2 ced64 bf16")
measure(mk(patch_size=2), "L2 patch2 (16 patches)")
