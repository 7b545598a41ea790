from .base import Backbone, FeatureTables
from .cawn import CAWN, CAWNInputs, CAWNNet
from .dygformer import DyGFormer, DyGFormerInputs, DyGFormerNet
from .edgebank import edge_bank_link_prediction
from .graphmixer import GraphMixer, GraphMixerInputs, GraphMixerNet, MLPMixer
from .tcl import TCL, TCLInputs, TCLNet
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
    "TCL",
    "TCLInputs",
    "TCLNet",
    "DyGFormer",
    "DyGFormerInputs",
    "DyGFormerNet",
    "CAWN",
    "CAWNInputs",
    "CAWNNet",
    "edge_bank_link_prediction",
]
