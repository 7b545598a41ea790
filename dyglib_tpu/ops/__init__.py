from .pallas.cooccurrence import cooccurrence_counts, cooccurrence_counts_reference

__all__ = ["cooccurrence_counts", "cooccurrence_counts_reference"]
