"""Checkpoint save/load for parameter + state pytrees.

Behavioral parity target: the reference checkpoints ``model.state_dict()``
plus a second non-parametric payload for memory models' raw message store
(utils/EarlyStopping.py:65-86). Here a checkpoint is a single pickle of the
numpy-ified pytree ``{"params": ..., "state": ...}`` — the memory state
(the analogue of the non-parametric payload) rides in the same file.
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params: Any, state: Any = None, extra: Any = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "params": _to_numpy(params),
        "state": _to_numpy(state) if state is not None else None,
        "extra": extra,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)
