"""dyglib_tpu — a TPU-native continuous-time dynamic-graph learning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of DyGLib
(webster-781/DyGLib): 9 dynamic-graph models (JODIE, DyRep, TGN, TGAT, CAWN,
EdgeBank, TCL, GraphMixer, DyGFormer) over a unified temporal-graph runtime,
with dynamic link prediction and dynamic node classification tasks.

Design principles (TPU-first, not a port):
  * All hot paths are static-shaped, batched, and jit-compiled; ragged
    temporal neighborhoods become padded fixed-K tensors with masks.
  * The temporal adjacency lives on device as a time-sorted CSR; neighbor
    sampling is a vectorized segment binary-search + gather, not a Python
    row loop (reference: utils/utils.py:149-214).
  * Node memory (TGN family) is a functional pytree updated with
    deterministic last-writer-wins scatters, shardable over the node axis
    of a `jax.sharding.Mesh` (reference: models/MemoryModel.py:304-422).
  * Multi-device scaling uses `jax.sharding` + XLA collectives over ICI.
"""

__version__ = "0.1.0"
