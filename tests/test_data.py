"""Data layer: preprocessing layout, split protocol invariants, batching."""
import numpy as np

from dyglib_tpu.data import (
    chronological_batches,
    get_link_prediction_data,
    get_node_classification_data,
)


def test_link_split_protocol(link_data):
    d = link_data
    full, train = d.full, d.train
    # 172-dim padded features with sentinel rows
    assert d.node_raw_features.shape[1] == 172
    assert d.edge_raw_features.shape[1] == 172
    assert np.all(d.edge_raw_features[0] == 0)

    # chronological split boundaries
    assert train.ts.max() <= d.val.ts.min()
    assert d.val.ts.max() <= d.test.ts.min()

    # splits partition the stream (train loses new-node edges)
    assert d.val.num_interactions + d.test.num_interactions + np.sum(
        full.ts <= np.quantile(full.ts, 0.7)
    ) == full.num_interactions

    # inductive protocol: no new-node edge in train; new_node_* subsets
    train_nodes = set(train.src) | set(train.dst)
    for s in (d.new_node_val, d.new_node_test):
        touched = [
            (a in train_nodes) and (b in train_nodes)
            for a, b in zip(s.src, s.dst)
        ]
        assert not any(touched)
    assert d.new_node_val.num_interactions <= d.val.num_interactions
    assert d.new_node_test.num_interactions <= d.test.num_interactions


def test_node_classification_split(synthetic_dataset):
    d = get_node_classification_data("synthetic", data_root=synthetic_dataset)
    n = d.full.num_interactions
    assert (
        d.train.num_interactions
        + d.val.num_interactions
        + d.test.num_interactions
        == n
    )
    assert d.train.ts.max() <= d.val.ts.min() <= d.val.ts.max() <= d.test.ts.min()


def test_chronological_batching(link_data):
    stream = link_data.train
    bs = 128
    batches = list(chronological_batches(stream, bs))
    total_valid = sum(b.valid.sum() for b in batches)
    assert total_valid == stream.num_interactions
    for b in batches:
        assert len(b.src) == bs  # static shape incl. final padded batch
        assert np.all(np.diff(b.ts[b.valid]) >= 0)
    # batches tile the stream chronologically
    recon = np.concatenate([b.eid[b.valid] for b in batches])
    assert np.array_equal(recon, stream.eid)


def test_split_determinism(synthetic_dataset):
    a = get_link_prediction_data("synthetic", data_root=synthetic_dataset)
    b = get_link_prediction_data("synthetic", data_root=synthetic_dataset)
    assert np.array_equal(a.train.eid, b.train.eid)
    assert np.array_equal(a.new_node_test.eid, b.new_node_test.eid)
