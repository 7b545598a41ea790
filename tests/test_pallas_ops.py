"""Pallas kernels: interpret-mode correctness vs jnp oracles (CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from dyglib_tpu.ops.pallas.cooccurrence import (
    cooccurrence_counts,
    cooccurrence_counts_reference,
)


@pytest.mark.parametrize(
    "r,lq,lk", [(4, 32, 32), (8, 128, 128), (5, 33, 257), (16, 256, 512)]
)
def test_cooccurrence_kernel_matches_reference(r, lq, lk):
    rng = np.random.default_rng(0)
    # small id range forces many collisions (the interesting regime)
    q = rng.integers(0, 17, size=(r, lq)).astype(np.int32)
    k = rng.integers(0, 17, size=(r, lk)).astype(np.int32)
    ours = cooccurrence_counts(jnp.asarray(q), jnp.asarray(k), interpret=True)
    ref = cooccurrence_counts_reference(jnp.asarray(q), jnp.asarray(k))
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_cooccurrence_self_counts():
    ids = jnp.asarray([[3, 3, 5, 0, 0, 3, 7, 5]], jnp.int32)
    out = np.asarray(cooccurrence_counts(ids, ids, interpret=True))
    np.testing.assert_array_equal(out[0], [3, 3, 2, 2, 2, 3, 1, 2])
