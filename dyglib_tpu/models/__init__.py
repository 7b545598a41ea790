from .base import Backbone, FeatureTables
from .tgat import TGAT, TGATInputs, TGATNet

__all__ = ["Backbone", "FeatureTables", "TGAT", "TGATInputs", "TGATNet"]
