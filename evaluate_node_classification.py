"""CLI: evaluate saved node-classification heads.

Mirrors the reference driver's surface (evaluate_node_classification.py).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dyglib_tpu.configs import get_node_classification_args
from dyglib_tpu.runners import run_node_classification_evaluation

from dyglib_tpu.utils import enable_compilation_cache

if __name__ == "__main__":
    enable_compilation_cache()
    args = get_node_classification_args()
    aggregate = run_node_classification_evaluation(args)
    for split, metrics in aggregate.items():
        for name, (mean, std) in metrics.items():
            print(f"{split} {name}: {mean:.4f} ± {std:.4f}")
