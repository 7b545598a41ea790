"""Benchmark: training throughput (edges/s/chip) on the flagship model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": N}

Baseline: the reference DyGLib TGAT training step at the same operating
point (B=200, K=20, L=2, Wikipedia-scale synthetic graph) on this machine's
only reference-supported backend (torch CPU, 8 threads), measured by
scripts/reference_throughput.py: 12.4 edges/s. Its cost is dominated by the
per-row Python neighbor-sampling loop (reference utils/utils.py:149-214);
ours runs sampling + forward + backward as one jitted TPU program.
"""
import json
import os
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_CPU_EDGES_PER_S = 12.4  # scripts/reference_throughput.py


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dyglib_tpu.data import get_link_prediction_data, write_synthetic_dataset
    from dyglib_tpu.graph.csr import time_keys
    from dyglib_tpu.models import TGAT
    from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig

    tmp = tempfile.mkdtemp(prefix="bench_")
    write_synthetic_dataset(
        tmp, "wiki", num_src=8227, num_dst=1000, num_edges=157474, seed=1
    )
    data = get_link_prediction_data("wiki", data_root=tmp)

    b, k = 200, 20  # the reference's operating point (batch_size, num_neighbors)
    backbone = TGAT(num_neighbors=k, num_layers=2, time_feat_dim=100)
    cfg = TrainConfig(batch_size=b)
    trainer = LinkPredictionTrainer(
        backbone, data, cfg, os.path.join(tmp, "ck.pkl")
    )
    params, opt_state = trainer.init_params(seed=0)

    train = data.train
    keys_all = time_keys(train.ts)

    def batch_at(s):
        return (
            jnp.asarray(train.src[s : s + b], jnp.int32),
            jnp.asarray(train.dst[s : s + b], jnp.int32),
            jnp.asarray(train.src[s : s + b], jnp.int32),
            jnp.asarray(train.dst[::-1][s : s + b], jnp.int32),
            jnp.asarray(keys_all[s : s + b], jnp.int32),
            jnp.ones((b,), jnp.float32),
        )

    key = jax.random.PRNGKey(0)
    # warmup / compile
    for i in range(3):
        params, opt_state, loss, _ = trainer.train_step(
            params, opt_state, trainer.train_csr, batch_at(i * b), key
        )
    jax.block_until_ready(loss)

    n_meas = 50
    t0 = time.time()
    for i in range(n_meas):
        params, opt_state, loss, _ = trainer.train_step(
            params, opt_state, trainer.train_csr,
            batch_at((3 + i) * b % (train.num_interactions - b)),
            jax.random.fold_in(key, i),
        )
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / n_meas
    edges_per_s = b / dt

    print(
        json.dumps(
            {
                "metric": "TGAT train-step throughput (B=200, K=20, L=2, Wikipedia-scale)",
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(edges_per_s / REFERENCE_CPU_EDGES_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
