"""Per-family ICI collective inventory on the virtual 8-device mesh.

VERDICT r3 #4: the >=80%-scaling-efficiency north star (BASELINE.json)
needs evidence beyond correctness. This script compiles each trainable
family's MESH train step (data=4 x model=2 virtual CPU mesh, the
dryrun_multichip layout) and walks the optimized HLO for collectives:
op kind, count, and bytes moved per step — the quantity that rides ICI
on real hardware. The per-family table goes to BASELINE.md; the guard
(node-sharded memory is NEVER fully all-gathered) is asserted here and
in tests/test_collective_guard.py.

Bytes-per-step vs step-compute is the scaling argument: DP gradient
all-reduces are O(params) once per step; memory-state exchanges are
O(batch rows), not O(N); nothing scales with the full node count.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/collective_inventory.py [family ...]
"""
from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

COLLECTIVES = (
    "all-reduce", "all-gather", "all-to-all", "collective-permute",
    "reduce-scatter",
)

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(sig: str) -> int:
    """Bytes of one HLO result signature, e.g. 'f32[4,200]' or a tuple."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(sig):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_inventory(hlo_text: str) -> dict:
    """{kind: {count, bytes, max_bytes, dims}} over collectives in HLO."""
    out: dict = {}
    for line in hlo_text.splitlines():
        s = line.strip()
        m = re.match(r"%?[\w.\-]+ = (.+?) (\w[\w\-]*)\(", s)
        if not m:
            continue
        kind = m.group(2)
        # Async collectives appear as <op>-start / <op>-done pairs; count
        # each pair exactly once via its -done op (whose declared type is
        # the clean result shape — the -start op declares a tuple that
        # would double-count bytes).  removesuffix, NOT rstrip: rstrip
        # strips a character set ("all-gather".rstrip("-start") ==
        # "all-gathe") — ADVICE r4.
        if kind.endswith("-start"):
            continue
        kind = kind.removesuffix("-done")
        if kind not in COLLECTIVES:
            continue
        d = out.setdefault(
            kind, {"count": 0, "bytes": 0, "max_bytes": 0, "dims": set()}
        )
        b = _shape_bytes(m.group(1))
        d["count"] += 1
        d["bytes"] += b
        d["max_bytes"] = max(d["max_bytes"], b)
        for _, dims in _SHAPE_RE.findall(m.group(1)):
            for x in dims.split(","):
                if x:
                    d["dims"].add(int(x))
    return out


def build_trainer(name, data, mesh, tmp):
    from dyglib_tpu.models import (
        CAWN, DyGFormer, GraphMixer, MemoryModel, TCL, TGAT,
        compute_src_dst_node_time_shifts,
    )
    from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig

    shifts = compute_src_dst_node_time_shifts(
        data.train.src, data.train.dst, data.train.ts
    )
    mk = {
        "TGAT": lambda: TGAT(num_neighbors=4, num_layers=2),
        "TGN": lambda: MemoryModel(model_name="TGN", num_neighbors=4,
                                   num_layers=1, time_shifts=shifts),
        "DyRep": lambda: MemoryModel(model_name="DyRep", num_neighbors=4,
                                     num_layers=1, time_shifts=shifts),
        "JODIE": lambda: MemoryModel(model_name="JODIE", time_shifts=shifts),
        "CAWN": lambda: CAWN(num_neighbors=4, walk_length=1, num_walk_heads=2),
        "TCL": lambda: TCL(num_neighbors=4, num_layers=1),
        "GraphMixer": lambda: GraphMixer(num_neighbors=4, num_layers=1,
                                         time_gap=32),
        "DyGFormer": lambda: DyGFormer(max_input_sequence_length=16,
                                       patch_size=2, num_layers=1),
    }[name]
    cfg = TrainConfig(batch_size=200, num_epochs=1, learning_rate=1e-3)
    return LinkPredictionTrainer(
        mk(), data, cfg, os.path.join(tmp, f"{name}.pkl"), mesh=mesh
    )


def compiled_step_hlo(tr):
    """Optimized HLO text of the mesh train step on one real batch."""
    from dyglib_tpu.data.batching import chronological_batches

    b = next(iter(chronological_batches(tr.data.train, tr.cfg.batch_size)))
    _, neg_dst = tr.train_neg.sample(b.num_valid)
    arrays = tr._batch_arrays(b, b.src, tr._pad_negs(neg_dst, b))
    arrays = tr._place_batch(arrays)
    key = tr._place_repl(jax.random.PRNGKey(0))
    params, opt_state = tr.init_params(0)
    state = tr.init_state()
    lowered = tr.train_step_jit.lower(
        params, opt_state, state, tr.train_csr, tr.tables, arrays, key, None
    )
    return lowered.compile().as_text()


def main():
    import tempfile

    from dyglib_tpu.data import get_link_prediction_data, write_synthetic_dataset
    from dyglib_tpu.parallel.mesh import make_mesh

    names = sys.argv[1:] or [
        "TGAT", "TGN", "DyRep", "JODIE", "CAWN", "TCL", "GraphMixer",
        "DyGFormer",
    ]
    tmp = tempfile.mkdtemp(prefix="collinv")
    root = "/tmp/collinv_data"
    if not os.path.exists(os.path.join(root, "s")):
        write_synthetic_dataset(root, "s", num_src=300, num_dst=100,
                                num_edges=4000, seed=3)
    data = get_link_prediction_data("s", data_root=root)
    mesh = make_mesh(model_parallelism=2)  # 8 devices -> data=4 x model=2

    results = {}
    for name in names:
        tr = build_trainer(name, data, mesh, tmp)
        hlo = compiled_step_hlo(tr)
        inv = collective_inventory(hlo)
        # guard: no collective result carries an O(num_nodes) dimension —
        # the node-sharded memory (and node feature table) must never ride
        # ICI whole. A batch-proportional delta exchange (dims 25..800 on
        # this fixture) is the designed traffic; num_nodes (401) collides
        # with no batch/feature dimension.
        n = data.num_nodes
        for kind, d in inv.items():
            bad = {x for x in d["dims"] if x in (n, n * 172)}
            assert not bad, (
                f"{name}: {kind} result has node-count-proportional "
                f"dims {bad} — node sharding is being undone"
            )
        results[name] = inv
        tot = sum(d["bytes"] for d in inv.values())
        parts = ", ".join(
            f"{k}: {d['count']}x/{d['bytes']/1e6:.2f}MB" for k, d in
            sorted(inv.items())
        )
        print(f"{name:>10}: total {tot/1e6:6.2f} MB/step | {parts}",
              flush=True)
        for d in inv.values():
            d["dims"] = sorted(d["dims"])

    path = os.environ.get("COLLINV_JSON")
    if path:
        with open(path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
