"""Checkpoint save/load for parameter + state pytrees.

Behavioral parity target: the reference checkpoints ``model.state_dict()``
plus a second non-parametric payload for memory models' raw message store
(utils/EarlyStopping.py:65-86). Here a checkpoint is a single pickle of the
numpy-ified pytree ``{"params": ..., "state": ...}`` — the memory state
(the analogue of the non-parametric payload) rides in the same file.

An optional ``backend="orbax"`` writes an orbax PyTree checkpoint directory
instead (async-capable, multi-host-aware storage — the production option
the reference never needed); ``load_checkpoint`` autodetects the format.
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    params: Any,
    state: Any = None,
    extra: Any = None,
    backend: str = "pickle",
) -> None:
    payload = {
        "params": _to_numpy(params),
        "state": _to_numpy(state) if state is not None else None,
        "extra": extra,
    }
    if backend == "orbax":
        _save_orbax(path, payload)
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    if os.path.isdir(path):  # orbax checkpoints are directories
        return _load_orbax(path)
    with open(path, "rb") as f:
        return pickle.load(f)


def _save_orbax(path: str, payload: dict) -> None:
    import orbax.checkpoint as ocp

    # arrays go through orbax (sharded/async-capable storage); "extra" may
    # hold non-array host metadata (epoch counters, RNG bookkeeping) and
    # rides alongside as a pickle inside the checkpoint directory
    arrays = {"params": payload["params"], "state": payload["state"]}
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, arrays, force=True)
    with open(os.path.join(path, "extra.pkl"), "wb") as f:
        pickle.dump(payload["extra"], f)


def _load_orbax(path: str) -> dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    arrays = ckptr.restore(os.path.abspath(path))
    extra = None
    extra_path = os.path.join(path, "extra.pkl")
    if os.path.exists(extra_path):
        with open(extra_path, "rb") as f:
            extra = pickle.load(f)
    return {"params": arrays["params"], "state": arrays["state"], "extra": extra}
