from .csr import TemporalCSR, build_temporal_csr
from .neg_sampler import NegativeEdgeSampler
from .sampler import (
    NeighborBlock,
    sample_multi_hop,
    sample_neighbors,
    sample_recent,
    sample_time_interval_aware,
    sample_uniform,
    window_bounds,
)

__all__ = [
    "TemporalCSR",
    "build_temporal_csr",
    "NegativeEdgeSampler",
    "NeighborBlock",
    "sample_multi_hop",
    "sample_neighbors",
    "sample_recent",
    "sample_time_interval_aware",
    "sample_uniform",
    "window_bounds",
]
