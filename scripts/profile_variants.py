"""Fused-scan timing for arbitrary backbone variants (subtraction profiling).

Usage: python scripts/profile_variants.py VARIANT [VARIANT ...]
Each VARIANT is a registry key below. Timing discipline identical to
scripts/measure_all_models.py (two warmups, fused 32-step scan, B=200).
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
from dyglib_tpu.models import (
    CAWN, DyGFormer, GraphMixer, MemoryModel, TCL, TGAT,
    compute_src_dst_node_time_shifts,
)
from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig

B = 200
root = os.path.join(tempfile.gettempdir(), "allmodels_ws")
if not os.path.exists(os.path.join(root, "wiki")):
    write_synthetic_dataset(root, "wiki", num_src=8227, num_dst=1000,
                            num_edges=157474, seed=1)
data = get_link_prediction_data("wiki", data_root=root)
train = data.train
keys_all = time_keys(train.ts)

VARIANTS = {
    # GraphMixer: isolate the time_gap node-encoder window cost
    "gm_full": lambda: GraphMixer(num_neighbors=20, num_layers=2),
    "gm_gather": lambda: GraphMixer(num_neighbors=20, num_layers=2,
                                    node_encoder_mode="gather"),
    "gm_tg200": lambda: GraphMixer(num_neighbors=20, num_layers=2, time_gap=200),
    "gm_tg2": lambda: GraphMixer(num_neighbors=20, num_layers=2, time_gap=2),
    "gm_l0": lambda: GraphMixer(num_neighbors=20, num_layers=0),
    # TGAT: dtype + fan-out cost
    "tgat_f32": lambda: TGAT(num_neighbors=20, num_layers=2),
    "tgat_nowin": lambda: TGAT(num_neighbors=20, num_layers=2,
                               use_window_attention=False),
    "tgat_ga": lambda: TGAT(num_neighbors=20, num_layers=2,
                            use_window_attention=False,
                            wants_entry_features=False,
                            use_gathered_attention=True),
    "tgat_noentry": lambda: TGAT(num_neighbors=20, num_layers=2,
                                 use_window_attention=False,
                                 wants_entry_features=False),
    "tgat_phifuse": lambda: TGAT(num_neighbors=20, num_layers=2,
                                 use_window_attention=False,
                                 wants_entry_features=False,
                                 use_phi_fusion=True),
    "tgat_bf16": lambda: TGAT(num_neighbors=20, num_layers=2,
                              compute_dtype="bfloat16"),
    "tgat_l1": lambda: TGAT(num_neighbors=20, num_layers=1),
    # CAWN breakdown
    "cawn_full": lambda: CAWN(num_neighbors=32, walk_length=1, num_walk_heads=8),
    "cawn_k8": lambda: CAWN(num_neighbors=8, walk_length=1, num_walk_heads=8),
    "cawn_bf16": lambda: CAWN(num_neighbors=32, walk_length=1, num_walk_heads=8,
                              compute_dtype="bfloat16"),
    # DyGFormer
    "dyg_full": lambda: DyGFormer(max_input_sequence_length=32, patch_size=1,
                                  num_layers=2),
    # CanParl best-config operating point (load_configs.py:219-227) — the
    # longest sequence axis in the reference; grounds the sequence-sharding
    # "when does it pay" note in BASELINE.md
    "dyg_canparl": lambda: DyGFormer(max_input_sequence_length=2048,
                                     patch_size=64, num_layers=2),
    "dyg_canparl_bf16": lambda: DyGFormer(max_input_sequence_length=2048,
                                          patch_size=64, num_layers=2,
                                          compute_dtype="bfloat16"),
    "dyg_canparl_tk": lambda: DyGFormer(max_input_sequence_length=2048,
                                        patch_size=64, num_layers=2,
                                        use_time_kernel=True),
    "dyg_canparl_notk": lambda: DyGFormer(max_input_sequence_length=2048,
                                          patch_size=64, num_layers=2,
                                          use_time_kernel=False),
    # round-5 window-fetch experiments (BASELINE.md "Round 5: contiguous
    # window-fetch at CanParl") — both NEGATIVE verdicts, reproducible here
    "dyg_canparl_fetch": lambda: DyGFormer(max_input_sequence_length=2048,
                                           patch_size=64, num_layers=2,
                                           use_entry_fetch=True),
    "dyg_canparl_fetch_gather": lambda: DyGFormer(
        max_input_sequence_length=2048, patch_size=64, num_layers=2,
        use_entry_fetch="gather"),
    "dyg_full_tk": lambda: DyGFormer(max_input_sequence_length=32,
                                     patch_size=1, num_layers=2,
                                     use_time_kernel=True),
    "dyg_lastfm_tk": lambda: DyGFormer(max_input_sequence_length=512,
                                       patch_size=16, num_layers=2,
                                       use_time_kernel=True),
    "dyg_lastfm_notk": lambda: DyGFormer(max_input_sequence_length=512,
                                         patch_size=16, num_layers=2,
                                         use_time_kernel=False),
    "dyg_bf16": lambda: DyGFormer(max_input_sequence_length=32, patch_size=1,
                                  num_layers=2, compute_dtype="bfloat16"),
    "tcl_full": lambda: TCL(num_neighbors=20, num_layers=2),
}


def measure(name, make, n_scan=32):
    tr = LinkPredictionTrainer(
        make(), data, TrainConfig(batch_size=B), os.path.join(root, "ck.pkl")
    )
    params, opt_state = tr.init_params(0)
    state = tr.init_state()

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
    t_c = time.time()
    out = (params, opt_state, state)
    for _ in range(2):  # compile, then donation-layout respecialization
        res = tr.train_epoch_scan_fn(*out, tr.train_csr, stacked, keys)
        jax.block_until_ready(res[3])
        out = res[:3]
    compile_s = time.time() - t_c
    t0 = time.time()
    res = tr.train_epoch_scan_fn(*out, tr.train_csr, stacked, keys)
    jax.block_until_ready(res[3])
    dt = (time.time() - t0) / n_scan
    print(f"{name:>12}: {dt*1e3:7.2f} ms/step | {B/dt:8.0f} edges/s "
          f"(compile+first {compile_s:.0f}s)", flush=True)


for name in sys.argv[1:]:
    try:
        measure(name, VARIANTS[name])
    except Exception as e:
        print(f"{name:>12}: FAILED {type(e).__name__}: {e}", flush=True)
