"""Ulysses sequence-sharded attention for DyGFormer's pre-LN encoder.

The interface (SURVEY §2.6/§5: "design for it at the attention-kernel
interface") is sharding annotations on the joint patch-token attention:
tokens sharded over a mesh axis for LN/projections/FFN, heads sharded over
the same axis for the attention itself; XLA inserts the two all_to_alls.

Checks: (1) numeric parity vs the unsharded single-device path under fixed
params; (2) the compiled HLO actually contains all-to-all collectives (the
annotations really induce a layout flip, not a no-op); (3) an end-to-end
training epoch on the mesh matches the unsharded losses.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dyglib_tpu.graph import build_temporal_csr
from dyglib_tpu.models import DyGFormer, FeatureTables
from dyglib_tpu.parallel.mesh import MODEL_AXIS, make_mesh

pytestmark = [
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs 8 virtual devices"
    ),
    pytest.mark.slow,  # heavyweight tier (see pytest.ini)
]


@pytest.fixture(scope="module")
def setup(link_data):
    d = link_data
    csr = build_temporal_csr(d.train, num_nodes=d.num_nodes)
    tables = FeatureTables(
        node=jnp.asarray(d.node_raw_features),
        edge=jnp.asarray(d.edge_raw_features),
    )
    return d, csr, tables


def _quad(d, b):
    from dyglib_tpu.graph.csr import time_keys

    ids = jnp.asarray(
        np.concatenate([d.train.src[:b], d.train.dst[:b],
                        d.train.src[b:2 * b], d.train.dst[b:2 * b]]),
        jnp.int32,
    )
    ts = jnp.tile(jnp.asarray(time_keys(d.train.ts[:b]), jnp.int32), 4)
    return ids, ts


def test_seq_sharded_matches_unsharded(setup):
    d, csr, tables = setup
    mk = dict(max_input_sequence_length=16, patch_size=2, num_layers=2)
    plain = DyGFormer(**mk)
    sharded = DyGFormer(**mk, sequence_axis=MODEL_AXIS)
    params = plain.init(jax.random.PRNGKey(0), tables, csr)

    ids, ts = _quad(d, 16)
    inputs = plain.sample(csr, ids, ts, jax.random.PRNGKey(1))
    out_plain = plain.apply(params, tables, inputs)

    mesh = make_mesh(8, model_parallelism=2)  # heads=2 -> 2-way Ulysses
    fn = jax.jit(lambda p, t, i: sharded.apply(p, t, i))
    with mesh:
        lowered = fn.lower(params, tables, inputs)
        hlo = lowered.compile().as_text()
        out_sharded = np.asarray(fn(params, tables, inputs))
    # the annotations must actually induce the Ulysses layout flip
    assert "all-to-all" in hlo, "no all_to_all in compiled HLO"
    np.testing.assert_allclose(
        np.asarray(out_plain), out_sharded, atol=2e-5, rtol=1e-5
    )


def test_seq_sharded_training_matches(setup, link_data, tmp_path):
    from dyglib_tpu.graph import NegativeEdgeSampler
    from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig

    import contextlib

    def losses(backbone, mesh, tag):
        cfg = TrainConfig(batch_size=200, num_epochs=1, learning_rate=1e-3)
        tr = LinkPredictionTrainer(
            backbone, link_data, cfg, str(tmp_path / f"{tag}.pkl"), mesh=mesh
        )
        tr.train_neg = NegativeEdgeSampler(
            link_data.train.src, link_data.train.dst, seed=3
        )
        # sequence sharding resolves bare PartitionSpec constraints against
        # the ACTIVE mesh context (the trainer's NamedShardings don't need
        # one) — the documented contract for sequence_axis; param init also
        # traces the module, so it too needs the context
        with mesh if mesh is not None else contextlib.nullcontext():
            params, opt_state = tr.init_params(0)
            _, _, _, ls, _ = tr.train_epoch(
                params, opt_state, None, 0, jax.random.PRNGKey(0)
            )
        return ls

    mk = dict(max_input_sequence_length=16, patch_size=2, num_layers=1)
    l1 = losses(DyGFormer(**mk), None, "plain")
    l8 = losses(
        DyGFormer(**mk, sequence_axis=MODEL_AXIS),
        make_mesh(8, model_parallelism=2), "seqsh",
    )
    np.testing.assert_allclose(l1, l8, rtol=2e-3, atol=2e-4)
