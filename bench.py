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
one jitted TPU program, and the headline measurement uses the framework's
scan-epoch mode (TrainConfig.scan_epochs): the whole measured window is ONE
fused lax.scan program, so the TPU never waits on the per-step host
dispatch (which crosses a network tunnel in this environment). A secondary
per-step-dispatch number goes to stderr for comparison.

Usage: python bench.py [tgat|dygformer] [--dispatch]
  (default: dygformer, the flagship; --dispatch makes the per-step
   dispatch loop the headline instead of the fused scan)
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

    from dyglib_tpu.utils import enable_compilation_cache, use_fast_prng

    enable_compilation_cache()
    use_fast_prng()  # hardware RBG dropout masks: +37% at this operating point
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
    dispatch_edges_per_s = b / dt

    # ---- fused scan window (scan-epoch mode): one program, no per-step
    # host dispatch on the measured path
    n_scan = 128  # one host dispatch amortized over the whole window
    starts = [(3 + i) * b % (train.num_interactions - b) for i in range(n_scan)]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[batch_at(s) for s in starts]
    )
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n_scan))
    # TWO warmup calls: the first compiles; the second can trigger a
    # one-time layout respecialization because donated outputs come back
    # with the executable's layouts (measured: a single-warmup timing can
    # be pure compile time on the remote-compile platform)
    for _ in range(2):
        params, opt_state, state, losses, _ = trainer.train_epoch_scan_fn(
            params, opt_state, state, trainer.train_csr, stacked, keys
        )
        jax.block_until_ready(losses)
    t0 = time.time()
    params, opt_state, state, losses, _ = trainer.train_epoch_scan_fn(
        params, opt_state, state, trainer.train_csr, stacked, keys
    )
    jax.block_until_ready(losses)
    scan_edges_per_s = n_scan * b / (time.time() - t0)

    dispatch_mode = "--dispatch" in sys.argv
    edges_per_s = dispatch_edges_per_s if dispatch_mode else scan_edges_per_s
    print(
        json.dumps(
            {
                "metric": label
                + ("" if dispatch_mode else ", fused scan-epoch window"),
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(edges_per_s / BASELINES[model_name], 2),
            }
        )
    )
    print(
        f"per-step dispatch: {dispatch_edges_per_s:.1f} edges/s | "
        f"fused scan ({n_scan} steps): {scan_edges_per_s:.1f} edges/s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    main(args[0] if args else "dygformer")
