"""Deterministic randomness plumbing.

The reference seeds python/numpy/torch globally (utils/utils.py:9-21) and
gives each sampler its own ``np.random.RandomState`` with a
``reset_random_state()`` hook so evaluation negatives are identical across
epochs/runs (utils/utils.py:275-280, 490-495).

The JAX-native equivalent is explicit key threading: one root key per run
seed, folded per (purpose, epoch, batch). Host-side numpy samplers keep
their own ``np.random.Generator`` with the same reset discipline.
"""
from __future__ import annotations

import os
import random

import jax
import numpy as np


def set_random_seed(seed: int = 0) -> jax.Array:
    """Seed host RNGs and return the root JAX key for this run."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def batch_key(root: jax.Array, epoch: int, batch_idx: int) -> jax.Array:
    """A unique key per (epoch, batch) — replaces global RNG stream advance."""
    return jax.random.fold_in(jax.random.fold_in(root, epoch), batch_idx)


def enable_compilation_cache(path: str = os.path.expanduser("~/.jax_cache")) -> None:
    """Persistent XLA compilation cache — critical on remote-compile TPU
    platforms where fresh compiles of large training-step graphs can take
    minutes; cached binaries survive process restarts."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
