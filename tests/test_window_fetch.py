"""Window-fetch variants (DyGFormer seq_feat): kernel / gather / plain
parity. The DMA kernel (ops/pallas/window_fetch.py) and the wide-row
gather formulation are default-OFF (measured negative at CanParl,
BASELINE.md round 5) but stay parity-tested as verified alternatives.

Runs on CPU via interpret mode; the kernel's real-chip bitwise parity
was verified on the TPU during round 5 (kernel-vs-gather max |d| = 0.0).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dyglib_tpu.data import get_link_prediction_data, write_synthetic_dataset
from dyglib_tpu.graph.csr import feat_entry_guard_pad
from dyglib_tpu.models import DyGFormer
from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wfetch"))
    write_synthetic_dataset(root, "s", num_src=150, num_dst=60,
                            num_edges=3000, seed=9)
    return get_link_prediction_data("s", data_root=root)


def _trainer(data, ef, tmp_path):
    bk = DyGFormer(max_input_sequence_length=64, patch_size=4,
                   num_layers=1, use_entry_fetch=ef)
    return LinkPredictionTrainer(
        bk, data, TrainConfig(batch_size=32), str(tmp_path / f"ck_{ef}.pkl")
    )


def test_fetch_paths_match_plain(data, tmp_path):
    """kernel (interpret) == gather == plain gathers, quad and triple."""
    trP = _trainer(data, False, tmp_path)
    trK = _trainer(data, True, tmp_path)
    trG = _trainer(data, "gather", tmp_path)
    assert trK.full_csr.feat_entry_slabs is not None
    assert trG.full_csr.feat_entry is not None
    params, _ = trP.init_params(0)
    params = params["backbone"]
    v = data.val
    ids = jnp.asarray(
        np.r_[v.src[:32], v.dst[:32], v.src[:32], v.dst[32:64]], jnp.int32
    )
    ts = jnp.concatenate([jnp.asarray(v.ts[:32], jnp.int32)] * 4)
    key = jax.random.PRNGKey(0)
    inP = trP.backbone.sample(trP.full_csr, ids, ts, key)
    inK = trK.backbone.sample(trK.full_csr, ids, ts, key)
    inG = trG.backbone.sample(trG.full_csr, ids, ts, key)
    assert inP.seq_feat is None
    # kernel vs gather formulation: bitwise
    np.testing.assert_array_equal(
        np.asarray(inK.seq_feat), np.asarray(inG.seq_feat)
    )
    outP = trP.backbone.apply(params, trP.tables, inP)
    outK = trK.backbone.apply(params, trK.tables, inK)
    # the packed projection rounds its operands to bf16 — identical to
    # what the TPU MXU does to the plain path's f32 operands (single-pass
    # bf16, BASELINE.md round-1 roofline note), but on this CPU test
    # backend the plain path computes true f32, so the comparison carries
    # bf16 input-rounding noise; structure errors (wrong rows/weights)
    # would show as O(1) diffs
    np.testing.assert_allclose(
        np.asarray(outK), np.asarray(outP), atol=5e-2, rtol=5e-2
    )
    # triple mode (exercises the co-dedup + seq_feat together)
    in3P = trP.backbone.sample(trP.full_csr, ids[:96], ts[:96], key)
    in3K = trK.backbone.sample(trK.full_csr, ids[:96], ts[:96], key)
    o3P = trP.backbone.apply(params, trP.tables, in3P, triple=True)
    o3K = trK.backbone.apply(params, trK.tables, in3K, triple=True)
    np.testing.assert_allclose(
        np.asarray(o3K), np.asarray(o3P), atol=5e-2, rtol=5e-2
    )


def test_kernel_random_windows_vs_numpy(data, tmp_path):
    """Raw kernel against a numpy oracle on random starts/counts,
    multi-tile grid path included."""
    from dyglib_tpu.ops.pallas.window_fetch import fetch_sequence_features

    trK = _trainer(data, True, tmp_path)
    csr = trK.full_csr
    pad = feat_entry_guard_pad(csr)
    rs = np.random.RandomState(3)
    n = 23
    starts = jnp.asarray(
        rs.randint(0, csr.num_entries - 40, n) + pad, jnp.int32
    )
    counts = jnp.asarray(rs.randint(0, 63, n), jnp.int32)
    tgts = jnp.asarray(
        2 * pad + csr.num_entries + rs.randint(0, csr.num_nodes, n),
        jnp.int32,
    )
    out = fetch_sequence_features(
        csr.feat_entry_slabs, tgts, starts, counts, 64, tile=16,
        interpret=True,
    )
    slabs = np.asarray(csr.feat_entry_slabs)
    tbl = np.concatenate(list(slabs), axis=1)
    ref = np.zeros((n, 64, tbl.shape[1]), np.float32)
    for i in range(n):
        ref[i, 0] = tbl[int(tgts[i])]
        c = int(counts[i])
        ref[i, 1 : 1 + c] = tbl[int(starts[i]) : int(starts[i]) + c]
    np.testing.assert_array_equal(np.asarray(out), ref)
