"""CLI: train a dynamic-graph model for link prediction.

Mirrors the reference driver's surface (train_link_prediction.py):
    python train_link_prediction.py --model_name TGAT --dataset_name wikipedia \
        --load_best_configs --num_runs 5
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dyglib_tpu.configs import get_link_prediction_args
from dyglib_tpu.runners import run_link_prediction_training

from dyglib_tpu.utils import enable_compilation_cache

if __name__ == "__main__":
    enable_compilation_cache()
    args = get_link_prediction_args(is_evaluation=False)
    aggregate = run_link_prediction_training(args)
    for split, metrics in aggregate.items():
        for name, (mean, std) in metrics.items():
            print(f"{split} {name}: {mean:.4f} ± {std:.4f}")
