"""bf16 operating-point accuracy validation: f32 vs bfloat16 end metrics.

Trains TGAT and DyGFormer at the bench operating point (Wikipedia-scale
synthetic, B=200, scan-epoch mode) in both compute dtypes for N seeds and
reports best-val/test AP side by side — the acceptance evidence for
--compute_dtype bfloat16 (documented in BASELINE.md).

Usage: python scripts/validate_bf16.py [epochs] [seeds]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
import jax

from dyglib_tpu.utils import enable_compilation_cache, use_fast_prng

enable_compilation_cache()
use_fast_prng()
import numpy as np

from dyglib_tpu.data import get_link_prediction_data, write_synthetic_dataset
from dyglib_tpu.models import DyGFormer, TGAT
from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SEEDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

root = os.path.join(tempfile.gettempdir(), "allmodels_ws")
if not os.path.exists(os.path.join(root, "wiki")):
    write_synthetic_dataset(root, "wiki", num_src=8227, num_dst=1000,
                            num_edges=157474, seed=1)
data = get_link_prediction_data("wiki", data_root=root)

MODELS = {
    "TGAT": lambda dt: TGAT(num_neighbors=20, num_layers=2, compute_dtype=dt),
    "DyGFormer": lambda dt: DyGFormer(
        max_input_sequence_length=32, patch_size=1, num_layers=2,
        compute_dtype=dt,
    ),
}

for name, make in MODELS.items():
    for dt in ("float32", "bfloat16"):
        vals, tests = [], []
        for seed in range(SEEDS):
            tr = LinkPredictionTrainer(
                make(dt), data,
                TrainConfig(batch_size=200, num_epochs=EPOCHS, patience=EPOCHS,
                            scan_epochs=True),
                os.path.join(root, f"v_{name}_{dt}_{seed}.pkl"),
            )
            t0 = time.time()
            res = tr.fit(seed=seed, log=lambda *a, **k: None)
            vals.append(res["validate metrics"]["average_precision"])
            tests.append(res["test metrics"]["average_precision"])
            print(f"{name} {dt} seed{seed}: val AP "
                  f"{vals[-1]:.4f} test AP {tests[-1]:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        print(f"== {name} {dt}: val {np.mean(vals):.4f}±{np.std(vals):.4f} "
              f"test {np.mean(tests):.4f}±{np.std(tests):.4f}", flush=True)
