"""Mesh-step collective guards (VERDICT r3 #4).

Compiles the TGN mesh train step on the 8-virtual-device mesh and walks
the optimized HLO: no collective may carry a num_nodes-proportional
dimension — the node-sharded memory state and node feature table must
never ride ICI whole. An accidental all-gather of sharded state would
pass every loss-parity test (the values are right; only the traffic is
wrong); this is the test that fails it.

The full 8-family inventory (bytes/step per collective kind) is
scripts/collective_inventory.py; its table lives in BASELINE.md.
"""
import os
import sys

import jax
import pytest

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


@pytest.mark.slow
def test_tgn_mesh_collectives_are_batch_proportional(link_data, tmp_path):
    sys.path.insert(0, SCRIPTS)
    import collective_inventory as ci

    from dyglib_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(model_parallelism=2)
    tr = ci.build_trainer("TGN", link_data, mesh, str(tmp_path))
    inv = ci.collective_inventory(ci.compiled_step_hlo(tr))
    assert inv, "mesh step compiled with no collectives at all?"
    n = link_data.num_nodes
    for kind, d in inv.items():
        bad = {x for x in d["dims"] if x in (n, n * 172)}
        assert not bad, (
            f"{kind} result has node-count-proportional dims {bad} — "
            "node sharding is being undone"
        )
    # gradient all-reduce must exist (DP is real) and stay O(params)
    assert "all-reduce" in inv
