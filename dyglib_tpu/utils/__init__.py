from .rng import (
    batch_key,
    enable_compilation_cache,
    set_random_seed,
    use_fast_prng,
)
from .tensorboard import SummaryWriter, read_scalar_events

__all__ = [
    "batch_key",
    "enable_compilation_cache",
    "set_random_seed",
    "use_fast_prng",
    "SummaryWriter",
    "read_scalar_events",
]
