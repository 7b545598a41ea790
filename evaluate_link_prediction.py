"""CLI: evaluate saved link-prediction checkpoints under a negative-sampling
strategy (random / historical / inductive), including the EdgeBank arm.

Mirrors the reference driver's surface (evaluate_link_prediction.py).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dyglib_tpu.configs import get_link_prediction_args
from dyglib_tpu.runners import run_link_prediction_evaluation

from dyglib_tpu.utils import enable_compilation_cache

if __name__ == "__main__":
    enable_compilation_cache()
    args = get_link_prediction_args(is_evaluation=True)
    aggregate = run_link_prediction_evaluation(args)
    for split, metrics in aggregate.items():
        for name, (mean, std) in metrics.items():
            print(f"{split} {name}: {mean:.4f} ± {std:.4f}")
