"""Multi-host bootstrap + chronological edge-stream sharding.

The contract that must survive any distribution (SURVEY §2.6): GLOBAL
chronological batch boundaries. Batch t must fully precede batch t+1 in
time; within a batch, edges are concurrent (the reference's keep-last
aggregation already assumes this). Therefore the correct multi-host layout
is: every host addresses the SAME global batch window and takes a disjoint
row slice of it — data parallelism inside the batch, never across batches.

These helpers provide the bootstrap and the slicing math; the mesh/sharding
machinery in `mesh.py` + the trainers' jitted steps are already
multi-device-ready (validated by `__graft_entry__.dryrun_multichip`).
"""
from __future__ import annotations

import jax


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> tuple[int, int]:
    """jax.distributed bootstrap; returns (process_index, process_count).

    No-op on a single process (the common case in this environment).
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def host_batch_slice(
    global_batch_size: int, process_index: int, process_count: int
) -> tuple[int, int]:
    """This host's (offset, length) inside every global chronological batch.

    Rows are distributed as evenly as possible; the first
    ``global_batch_size % process_count`` hosts take one extra row. The
    union over hosts is exactly [0, global_batch_size) with no overlap,
    preserving the global batch boundary contract.
    """
    assert 0 <= process_index < process_count
    base = global_batch_size // process_count
    extra = global_batch_size % process_count
    length = base + (1 if process_index < extra else 0)
    offset = process_index * base + min(process_index, extra)
    return offset, length
