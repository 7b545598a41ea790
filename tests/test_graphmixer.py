"""GraphMixer: MLPMixer parity vs torch reference + end-to-end training."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dyglib_tpu.models import GraphMixer, MLPMixer
from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig

REF = "/root/reference"
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not available")
def test_mlp_mixer_parity():
    torch = pytest.importorskip("torch")
    from models.GraphMixer import MLPMixer as RefMixer

    rng = np.random.default_rng(0)
    b, k, c = 4, 20, 172
    x = rng.normal(size=(b, k, c)).astype(np.float32)

    m = MLPMixer(num_tokens=k, num_channels=c, dropout=0.1)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = m.apply(params, jnp.asarray(x), train=False)

    ref = RefMixer(num_tokens=k, num_channels=c, dropout=0.1)
    p = params["params"]

    def set_linear(tl, kernel, bias):
        with torch.no_grad():
            tl.weight.copy_(torch.from_numpy(np.asarray(kernel).T.copy()))
            tl.bias.copy_(torch.from_numpy(np.asarray(bias).copy()))

    def set_norm(tn, scale, bias):
        with torch.no_grad():
            tn.weight.copy_(torch.from_numpy(np.asarray(scale).copy()))
            tn.bias.copy_(torch.from_numpy(np.asarray(bias).copy()))

    set_norm(ref.token_norm, p["token_norm"]["scale"], p["token_norm"]["bias"])
    set_linear(ref.token_feedforward.ffn[0], p["token_ff"]["fc1"]["kernel"],
               p["token_ff"]["fc1"]["bias"])
    set_linear(ref.token_feedforward.ffn[3], p["token_ff"]["fc2"]["kernel"],
               p["token_ff"]["fc2"]["bias"])
    set_norm(ref.channel_norm, p["channel_norm"]["scale"], p["channel_norm"]["bias"])
    set_linear(ref.channel_feedforward.ffn[0], p["channel_ff"]["fc1"]["kernel"],
               p["channel_ff"]["fc1"]["bias"])
    set_linear(ref.channel_feedforward.ffn[3], p["channel_ff"]["fc2"]["kernel"],
               p["channel_ff"]["fc2"]["bias"])
    ref.eval()
    theirs = ref(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4)


@pytest.mark.slow
def test_graphmixer_end_to_end(link_data, tmp_path):
    backbone = GraphMixer(num_neighbors=10, num_layers=2, time_gap=200)
    cfg = TrainConfig(batch_size=200, num_epochs=3, patience=5, learning_rate=1e-3)
    trainer = LinkPredictionTrainer(backbone, link_data, cfg, str(tmp_path / "gm.pkl"))
    results = trainer.fit(seed=0, log=lambda *a: None)
    ap = results["test metrics"]["average_precision"]
    # band floor (tests/calibration_fixture.json): ours 0.7517 +- 0.0195,
    # ref 0.7591 +- 0.0128 -> mean - 3.25 sigma ~ 0.68 (old 0.55 was
    # insensitive by a full 0.2 AP)
    # round-4 band (shipped protocol): ours 0.7816 +- 0.0072, ref
    # identical -> floor mean - max(3 sigma, 0.03) = 0.752
    assert ap > 0.75, f"GraphMixer test AP {ap}"


@pytest.mark.slow
def test_node_encoder_prefix_matches_gather(link_data):
    """The O(1) prefix-sum node encoder must reproduce the (B, time_gap, Dn)
    gather aggregation (same window, same mean) to float32 accuracy."""
    from dyglib_tpu.graph.csr import build_temporal_csr, time_keys
    from dyglib_tpu.models.base import FeatureTables

    d = link_data
    csr = build_temporal_csr(
        d.full, num_nodes=d.num_nodes, feat_prefix_of=d.node_raw_features
    )
    tables = FeatureTables(
        node=jnp.asarray(d.node_raw_features),
        edge=jnp.asarray(d.edge_raw_features),
    )
    ids = jnp.asarray(d.test.src[:64], jnp.int32)
    ts = jnp.asarray(time_keys(d.test.ts[:64]), jnp.int32)
    key = jax.random.PRNGKey(0)

    outs = {}
    for mode in ("prefix", "gather"):
        bb = GraphMixer(
            num_neighbors=10, num_layers=2, time_gap=64, node_encoder_mode=mode
        )
        params = bb.init(jax.random.PRNGKey(1), tables, csr)
        inputs = bb.sample(csr, ids, ts, key)
        if mode == "prefix":
            assert inputs.tg_sum is not None and inputs.tg_ids is None
        else:
            assert inputs.tg_sum is None and inputs.tg_ids is not None
        outs[mode] = np.asarray(bb.apply(params, tables, inputs, train=False))
    np.testing.assert_allclose(outs["prefix"], outs["gather"], atol=2e-4)


def test_frozen_time_encoder(link_data, tmp_path):
    """GraphMixer's time encoder must not receive gradient updates
    (parameter_requires_grad=False, reference GraphMixer.py:45)."""
    import jax

    backbone = GraphMixer(num_neighbors=5, num_layers=1, time_gap=50)
    cfg = TrainConfig(batch_size=100, num_epochs=1, learning_rate=1e-2)
    trainer = LinkPredictionTrainer(backbone, link_data, cfg, str(tmp_path / "f.pkl"))
    params, opt_state = trainer.init_params(0)
    w_before = np.asarray(
        params["backbone"]["params"]["time_encoder"]["w"]
    ).copy()
    state = trainer.init_state()
    params, opt_state, state, *_ = trainer.train_epoch(
        params, opt_state, state, 0, jax.random.PRNGKey(0)
    )[:5]
    w_after = np.asarray(params["backbone"]["params"]["time_encoder"]["w"])
    np.testing.assert_array_equal(w_before, w_after)
