"""Scale-out: device meshes, shardings, and the pod-scaling design.

The reference is strictly single-process single-device (SURVEY §2.6: no
torch.distributed, no NCCL, no model sharding of any kind). Everything in
this package is therefore NEW capability, designed jax-natively:

Working today (validated by ``__graft_entry__.dryrun_multichip`` on an
8-device mesh every round):
  * 2-D ``data x model`` mesh (`mesh.py`);
  * data parallelism over the chronological batch axis — safe because the
    reference already treats intra-batch edges as concurrent (keep-last
    message aggregation, MemoryModel.py:287-291), so splitting a batch
    across devices preserves its semantics exactly;
  * feature tables sharded over the model axis (column sharding);
  * memory-model state sharded over the NODE axis: the lazy memory view's
    gathers and the keep-last commit scatters against node-sharded arrays
    are partitioned by XLA into ICI collectives automatically.

Design for multi-host pods (next rounds):
  * per-host loading of the chronological edge stream with GLOBAL batch
    boundaries (batch t must fully precede batch t+1 — the reference's
    train-before-use contract);
  * `jax.distributed.initialize` + the same mesh spanning hosts; memory
    deltas ride the node-axis collectives over ICI, overlappable with
    neighborhood aggregation via pallas async remote copies
    (`make_async_remote_copy`) if profiling shows exposed latency;
  * DyGFormer's long-history axis (up to 2048) stays single-chip — after
    patching it is at most 64 transformer tokens (patching IS the
    reference's long-context mechanism, SURVEY §5); ring/Ulysses sequence
    parallelism only becomes relevant for histories far beyond the
    reference's operating points, and would slot in at the attention call
    in `models/dygformer.py::PreLNTransformerEncoder`.
"""
from .distributed import host_batch_slice, initialize_distributed
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharded,
    feature_sharded,
    make_mesh,
    replicated,
)

__all__ = [
    "host_batch_slice",
    "initialize_distributed",
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharded",
    "feature_sharded",
    "make_mesh",
    "replicated",
]
