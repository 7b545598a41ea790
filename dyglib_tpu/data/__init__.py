from .containers import EdgeStream
from .batching import Batch, chronological_batches, num_batches
from .datasets import (
    FEAT_DIM,
    LinkPredictionData,
    NodeClassificationData,
    get_link_prediction_data,
    get_node_classification_data,
)
from .preprocess import (
    BIPARTITE_DATASETS,
    DATASET_NAMES,
    check_processed,
    preprocess_dataset,
)
from .statistics import dataset_statistics
from .synthetic import make_synthetic_bipartite, write_synthetic_dataset

__all__ = [
    "EdgeStream",
    "Batch",
    "chronological_batches",
    "num_batches",
    "FEAT_DIM",
    "LinkPredictionData",
    "NodeClassificationData",
    "get_link_prediction_data",
    "get_node_classification_data",
    "BIPARTITE_DATASETS",
    "DATASET_NAMES",
    "check_processed",
    "preprocess_dataset",
    "dataset_statistics",
    "make_synthetic_bipartite",
    "write_synthetic_dataset",
]
