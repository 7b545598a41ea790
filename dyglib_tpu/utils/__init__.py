from .rng import batch_key, set_random_seed

__all__ = ["batch_key", "set_random_seed"]
