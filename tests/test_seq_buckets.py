"""DyGFormer per-batch sequence-length buckets.

The bucketed forward must be bit-identical to a model built with
max_input_sequence_length == bucket (parameters are sequence-length
independent), and the trainer must pick the smallest covering bucket —
the static-shape analogue of the reference's per-batch dynamic padding
(DyGFormer.py:219-226).
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from dyglib_tpu.graph import build_temporal_csr
from dyglib_tpu.graph.csr import time_keys
from dyglib_tpu.models import DyGFormer, FeatureTables
from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig


def test_bucket_candidates_shape():
    m = DyGFormer(max_input_sequence_length=2048, patch_size=64)
    cands = m.bucket_candidates
    assert cands[-1] == m.seq_len == 2048
    assert all(c % 64 == 0 for c in cands)
    assert list(cands) == sorted(cands)

    m2 = DyGFormer(max_input_sequence_length=32, patch_size=1)
    assert m2.bucket_candidates == (8, 16, 32)


def test_bucketed_forward_matches_smaller_model(link_data):
    """sample(seq_len=B) + apply == a maxlen=B model with the same params."""
    csr = build_temporal_csr(link_data.full, num_nodes=link_data.num_nodes)
    tables = FeatureTables(
        node=jnp.asarray(link_data.node_raw_features),
        edge=jnp.asarray(link_data.edge_raw_features),
    )
    big = DyGFormer(max_input_sequence_length=64, patch_size=2, num_layers=1)
    small = DyGFormer(max_input_sequence_length=16, patch_size=2, num_layers=1)
    params = big.init(jax.random.PRNGKey(0), tables, csr)

    tr = link_data.train
    b = 8
    ids = jnp.asarray(
        np.concatenate([tr.src[:b], tr.dst[:b], tr.src[:b], tr.dst[b : 2 * b]]),
        jnp.int32,
    )
    ts = jnp.tile(jnp.asarray(time_keys(tr.ts[100 : 100 + b]), jnp.int32), 4)
    key = jax.random.PRNGKey(1)

    out_bucketed = big.apply(params, tables, big.sample(csr, ids, ts, key, seq_len=16))
    out_small = small.apply(params, tables, small.sample(csr, ids, ts, key))
    np.testing.assert_array_equal(np.asarray(out_bucketed), np.asarray(out_small))

    # params are sequence-length independent: shapes identical for both models
    s1 = jax.tree_util.tree_map(lambda x: x.shape, params)
    s2 = jax.tree_util.tree_map(
        lambda x: x.shape, small.init(jax.random.PRNGKey(0), tables, csr)
    )
    assert s1 == s2


@pytest.mark.slow
def test_trainer_picks_covering_buckets(link_data, tmp_path):
    backbone = DyGFormer(max_input_sequence_length=64, patch_size=2, num_layers=1)
    cfg = TrainConfig(batch_size=100, num_epochs=1, sequence_buckets=True)
    trainer = LinkPredictionTrainer(
        backbone, link_data, cfg, str(tmp_path / "ck.pkl")
    )
    assert trainer._buckets == backbone.bucket_candidates

    from dyglib_tpu.data.batching import chronological_batches

    batches = list(chronological_batches(link_data.train, 100))
    first = trainer._pick_bucket(trainer.train_csr, batches[0], batches[0].src, batches[0].dst)
    # the first chronological batch can't have filled the full history yet
    assert first is not None and first < 64

    # bucket = smallest candidate covering the true max history (+1 target)
    offs = np.asarray(trainer.train_csr.offsets)
    tsarr = np.asarray(trainer.train_csr.ts)
    b0 = batches[0]
    tk = time_keys(b0.ts)
    mx = max(
        int(np.searchsorted(tsarr[offs[n] : offs[n + 1]], t))
        for ids in (b0.src, b0.dst)
        for n, t in zip(ids, tk)
    )
    assert first >= min(1 + mx, 64)
    smaller = [c for c in trainer._buckets if c < first]
    if smaller:
        assert smaller[-1] < 1 + mx  # next-smaller bucket would not cover

    # end-to-end: a bucketed epoch trains to finite losses
    params, opt_state = trainer.init_params(0)
    params, opt_state, _, losses, _ = trainer.train_epoch(
        params, opt_state, None, 0, jax.random.PRNGKey(0)
    )
    assert np.isfinite(losses).all()


def test_buckets_off_by_config(link_data, tmp_path):
    backbone = DyGFormer(max_input_sequence_length=64, patch_size=2, num_layers=1)
    cfg = TrainConfig(batch_size=100, sequence_buckets=False)
    trainer = LinkPredictionTrainer(
        backbone, link_data, cfg, str(tmp_path / "ck.pkl")
    )
    assert trainer._buckets is None
    from dyglib_tpu.data.batching import chronological_batches

    b = next(iter(chronological_batches(link_data.train, 100)))
    assert trainer._pick_bucket(trainer.train_csr, b, b.src, b.dst) is None


def test_pick_bucket_matches_naive_oracle(link_data, tmp_path):
    """The batched-searchsorted _pick_bucket must match a per-row python
    oracle (strictly-before history counts, +1 target, smallest covering
    bucket) over many random query batches."""
    backbone = DyGFormer(max_input_sequence_length=64, patch_size=2, num_layers=1)
    cfg = TrainConfig(batch_size=32, sequence_buckets=True)
    trainer = LinkPredictionTrainer(
        backbone, link_data, cfg, str(tmp_path / "ck.pkl")
    )
    csr = trainer.full_csr
    offsets = np.asarray(csr.offsets)
    tsarr = np.asarray(csr.ts)
    buckets = trainer._buckets
    assert buckets and len(buckets) > 1

    rng = np.random.default_rng(0)
    stream = link_data.full

    class FakeBatch:
        pass

    for trial in range(20):
        idx = rng.integers(0, stream.num_interactions, size=16)
        b = FakeBatch()
        b.src = stream.src[idx]
        b.dst = stream.dst[idx]
        b.ts = stream.ts[idx]
        neg_src = stream.src[rng.integers(0, stream.num_interactions, size=16)]
        neg_dst = stream.dst[rng.integers(0, stream.num_interactions, size=16)]

        got = trainer._pick_bucket(csr, b, neg_src, neg_dst)

        tk = np.asarray(time_keys(b.ts))
        mx = 0
        for ids in (b.src, b.dst, neg_src, neg_dst):
            for n, t in zip(ids, tk):
                lo, hi = int(offsets[n]), int(offsets[n + 1])
                c = int(np.searchsorted(tsarr[lo:hi], t, side="left"))
                mx = max(mx, c)
        if mx >= buckets[-1] - 1:
            want = None
        else:
            w = next(c for c in buckets if c >= 1 + mx)
            want = None if w == buckets[-1] else w
        assert got == want, (trial, got, want, mx)
