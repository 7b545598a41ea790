"""Dataset loading and chronological train/val/test splitting.

Behavioral parity target: utils/DataLoader.py:67-230 of the reference.

Link-prediction split protocol (DataLoader.py:67-175):
  * features are zero-padded to 172 dims (asserted <= 172);
  * val/test boundary times are the (1 - val - test) / (1 - test) quantiles
    of the timestamp column;
  * inductive protocol: with ``random.seed(2020)``, 10% of ALL nodes are
    sampled from the post-val-time node set as "new nodes" and every edge
    touching one is removed from train; new_node_val/test contain val/test
    edges touching at least one node absent from the train node set.

Node-classification split (DataLoader.py:178-230): plain chronological
3-way split, no new-node logic.
"""
from __future__ import annotations

import dataclasses
import os
import random

import numpy as np
import pandas as pd

from .containers import EdgeStream

FEAT_DIM = 172  # reference pads all node/edge features to 172 (DataLoader.py:81)


@dataclasses.dataclass
class LinkPredictionData:
    node_raw_features: np.ndarray  # (N+1, 172) float32, row 0 = sentinel
    edge_raw_features: np.ndarray  # (E+1, 172) float32, row 0 = sentinel
    full: EdgeStream
    train: EdgeStream
    val: EdgeStream
    test: EdgeStream
    new_node_val: EdgeStream
    new_node_test: EdgeStream

    @property
    def num_nodes(self) -> int:
        """Number of node-id slots including the 0 sentinel."""
        return self.node_raw_features.shape[0]


@dataclasses.dataclass
class NodeClassificationData:
    node_raw_features: np.ndarray
    edge_raw_features: np.ndarray
    full: EdgeStream
    train: EdgeStream
    val: EdgeStream
    test: EdgeStream

    @property
    def num_nodes(self) -> int:
        return self.node_raw_features.shape[0]


def _pad_features(feats: np.ndarray, dim: int = FEAT_DIM) -> np.ndarray:
    """Zero-pad feature columns to ``dim`` (reference DataLoader.py:81-92)."""
    assert feats.shape[1] <= dim, (
        f"feature dimension {feats.shape[1]} is bigger than {dim}"
    )
    if feats.shape[1] < dim:
        pad = np.zeros((feats.shape[0], dim - feats.shape[1]))
        feats = np.concatenate([feats, pad], axis=1)
    return feats


def _load_processed(dataset_name: str, data_root: str):
    d = os.path.join(data_root, dataset_name)
    graph_df = pd.read_csv(os.path.join(d, f"ml_{dataset_name}.csv"))
    edge_feats = np.load(os.path.join(d, f"ml_{dataset_name}.npy"))
    node_feats = np.load(os.path.join(d, f"ml_{dataset_name}_node.npy"))
    return graph_df, edge_feats, node_feats


def _stream_from_frame(graph_df: pd.DataFrame) -> EdgeStream:
    return EdgeStream(
        src=graph_df.u.values.astype(np.int64),
        dst=graph_df.i.values.astype(np.int64),
        ts=graph_df.ts.values.astype(np.float64),
        eid=graph_df.idx.values.astype(np.int64),
        label=graph_df.label.values.astype(np.float64),
    )


def get_link_prediction_data(
    dataset_name: str,
    val_ratio: float = 0.15,
    test_ratio: float = 0.15,
    data_root: str = "./processed_data",
) -> LinkPredictionData:
    """Load + split a dataset for transductive & inductive link prediction.

    Mirrors reference get_link_prediction_data (DataLoader.py:67-175).
    One deliberate deviation: the reference calls ``random.sample`` on a raw
    ``set`` (DataLoader.py:115), whose iteration order is a Python
    implementation detail (and a TypeError on Python >= 3.11); we sample
    from the *sorted* node list under the same seed 2020, which is
    deterministic across interpreter versions.
    """
    graph_df, edge_feats, node_feats = _load_processed(dataset_name, data_root)
    node_feats = _pad_features(node_feats).astype(np.float32)
    edge_feats = _pad_features(edge_feats).astype(np.float32)

    full = _stream_from_frame(graph_df)
    val_time, test_time = np.quantile(
        full.ts, [1.0 - val_ratio - test_ratio, 1.0 - test_ratio]
    )

    rng = random.Random(2020)  # protocol seed (DataLoader.py:106)
    node_set = set(full.src) | set(full.dst)
    num_total_unique_node_ids = len(node_set)
    test_node_set = set(full.src[full.ts > val_time]) | set(
        full.dst[full.ts > val_time]
    )
    new_test_node_set = set(
        rng.sample(sorted(test_node_set), int(0.1 * num_total_unique_node_ids))
    )

    new_test_src_mask = np.isin(full.src, list(new_test_node_set))
    new_test_dst_mask = np.isin(full.dst, list(new_test_node_set))
    observed_edges_mask = ~new_test_src_mask & ~new_test_dst_mask

    train_mask = (full.ts <= val_time) & observed_edges_mask
    train = full.mask(train_mask)

    train_node_set = set(train.src) | set(train.dst)
    assert len(train_node_set & new_test_node_set) == 0
    new_node_set = node_set - train_node_set

    val_mask = (full.ts <= test_time) & (full.ts > val_time)
    test_mask = full.ts > test_time
    edge_contains_new_node = np.isin(full.src, list(new_node_set)) | np.isin(
        full.dst, list(new_node_set)
    )

    return LinkPredictionData(
        node_raw_features=node_feats,
        edge_raw_features=edge_feats,
        full=full,
        train=train,
        val=full.mask(val_mask),
        test=full.mask(test_mask),
        new_node_val=full.mask(val_mask & edge_contains_new_node),
        new_node_test=full.mask(test_mask & edge_contains_new_node),
    )


def get_node_classification_data(
    dataset_name: str,
    val_ratio: float = 0.15,
    test_ratio: float = 0.15,
    data_root: str = "./processed_data",
) -> NodeClassificationData:
    """Load + split for dynamic node classification (DataLoader.py:178-230)."""
    graph_df, edge_feats, node_feats = _load_processed(dataset_name, data_root)
    node_feats = _pad_features(node_feats).astype(np.float32)
    edge_feats = _pad_features(edge_feats).astype(np.float32)

    full = _stream_from_frame(graph_df)
    val_time, test_time = np.quantile(
        full.ts, [1.0 - val_ratio - test_ratio, 1.0 - test_ratio]
    )
    train_mask = full.ts <= val_time
    val_mask = (full.ts <= test_time) & (full.ts > val_time)
    test_mask = full.ts > test_time

    return NodeClassificationData(
        node_raw_features=node_feats,
        edge_raw_features=edge_feats,
        full=full,
        train=full.mask(train_mask),
        val=full.mask(val_mask),
        test=full.mask(test_mask),
    )
