"""Benchmark: training throughput (edges/s/chip) on the flagship model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": N}

Baselines (this machine's only reference-supported backend, torch CPU with
8 threads, measured by scripts/reference_*_throughput.py at the identical
operating point on Wikipedia-scale synthetic data):
  * DyGFormer (B=200, maxlen=32, patch=1): 76.5 edges/s
  * TGAT      (B=200, K=20, L=2):          12.4 edges/s
The reference's cost is the per-row Python neighbor loop + per-batch
host/device chatter; ours runs sampling + forward + backward + update as
one jitted TPU program.

Usage: python bench.py [tgat|dygformer]   (default: dygformer, the flagship)
"""
import json
import os
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

BASELINES = {
    "dygformer": 76.5,  # scripts/reference_dygformer_throughput.py
    "tgat": 12.4,  # scripts/reference_throughput.py
}


def main(model_name: str = "dygformer"):
    import jax

    from dyglib_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from dyglib_tpu.data import get_link_prediction_data, write_synthetic_dataset
    from dyglib_tpu.graph.csr import time_keys
    from dyglib_tpu.models import DyGFormer, TGAT
    from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig

    tmp = tempfile.mkdtemp(prefix="bench_")
    write_synthetic_dataset(
        tmp, "wiki", num_src=8227, num_dst=1000, num_edges=157474, seed=1
    )
    data = get_link_prediction_data("wiki", data_root=tmp)

    b = 200  # the reference's operating point
    if model_name == "dygformer":
        backbone = DyGFormer(
            max_input_sequence_length=32, patch_size=1, num_layers=2
        )
        label = "DyGFormer train-step throughput (B=200, maxlen=32, patch=1, Wikipedia-scale)"
    else:
        backbone = TGAT(num_neighbors=20, num_layers=2, time_feat_dim=100)
        label = "TGAT train-step throughput (B=200, K=20, L=2, Wikipedia-scale)"

    trainer = LinkPredictionTrainer(
        backbone, data, TrainConfig(batch_size=b), os.path.join(tmp, "ck.pkl")
    )
    params, opt_state = trainer.init_params(seed=0)
    state = trainer.init_state()

    train = data.train
    keys_all = time_keys(train.ts)

    def batch_at(s):
        return (
            jnp.asarray(train.src[s : s + b], jnp.int32),
            jnp.asarray(train.dst[s : s + b], jnp.int32),
            jnp.asarray(train.src[s : s + b], jnp.int32),
            jnp.asarray(train.dst[::-1][s : s + b], jnp.int32),
            jnp.asarray(keys_all[s : s + b], jnp.int32),
            jnp.asarray(train.eid[s : s + b], jnp.int32),
            jnp.ones((b,), jnp.float32),
        )

    key = jax.random.PRNGKey(0)
    for i in range(3):  # warmup / compile
        params, opt_state, state, loss, _ = trainer.train_step(
            params, opt_state, state, trainer.train_csr, batch_at(i * b), key
        )
    jax.block_until_ready(loss)

    n_meas = 50
    t0 = time.time()
    for i in range(n_meas):
        params, opt_state, state, loss, _ = trainer.train_step(
            params, opt_state, state, trainer.train_csr,
            batch_at((3 + i) * b % (train.num_interactions - b)),
            jax.random.fold_in(key, i),
        )
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / n_meas
    edges_per_s = b / dt

    print(
        json.dumps(
            {
                "metric": label,
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(edges_per_s / BASELINES[model_name], 2),
            }
        )
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "dygformer")
