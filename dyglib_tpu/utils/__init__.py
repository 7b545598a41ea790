from .rng import batch_key, enable_compilation_cache, set_random_seed

__all__ = ["batch_key", "enable_compilation_cache", "set_random_seed"]
