from .base import Backbone, FeatureTables
from .graphmixer import GraphMixer, GraphMixerInputs, GraphMixerNet, MLPMixer
from .memory_model import (
    MemoryModel,
    MemoryModelInputs,
    MemoryModelNet,
    MemoryState,
    TimeShiftStats,
    compute_src_dst_node_time_shifts,
)
from .tgat import TGAT, TGATInputs, TGATNet

__all__ = [
    "Backbone",
    "FeatureTables",
    "GraphMixer",
    "GraphMixerInputs",
    "GraphMixerNet",
    "MLPMixer",
    "MemoryModel",
    "MemoryModelInputs",
    "MemoryModelNet",
    "MemoryState",
    "TimeShiftStats",
    "compute_src_dst_node_time_shifts",
    "TGAT",
    "TGATInputs",
    "TGATNet",
]
