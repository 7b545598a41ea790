from .modules import (
    LN_EPS,
    MergeLayer,
    MLPClassifier,
    TemporalMultiHeadAttention,
    TimeEncoder,
    TransformerEncoder,
    time_encoder_spectrum,
)

__all__ = [
    "LN_EPS",
    "MergeLayer",
    "MLPClassifier",
    "TemporalMultiHeadAttention",
    "TimeEncoder",
    "TransformerEncoder",
    "time_encoder_spectrum",
]
