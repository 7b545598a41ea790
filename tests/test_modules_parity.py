"""Layer-level allclose parity vs the PyTorch reference implementation.

Imports the reference modules directly from /root/reference (read-only
oracle, never vendored) when present, transplants our flax parameters into
them, and compares forward outputs in eval mode (dropout off).
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

from dyglib_tpu.nn.modules import (  # noqa: E402
    MergeLayer,
    MLPClassifier,
    TemporalMultiHeadAttention,
    TimeEncoder,
    TransformerEncoder,
)


def t2n(t):
    return t.detach().cpu().numpy()


def set_linear(torch_linear, kernel, bias=None):
    with torch.no_grad():
        torch_linear.weight.copy_(torch.from_numpy(np.asarray(kernel).T.copy()))
        if bias is not None:
            torch_linear.bias.copy_(torch.from_numpy(np.asarray(bias).copy()))


def test_time_encoder_parity():
    from models.modules import TimeEncoder as RefTimeEncoder

    d = 100
    enc = TimeEncoder(d)
    ts = np.random.default_rng(0).uniform(0, 1e5, (4, 7)).astype(np.float32)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(ts))
    ours = enc.apply(params, jnp.asarray(ts))

    ref = RefTimeEncoder(time_dim=d)
    ref.eval()
    theirs = ref(torch.from_numpy(ts))
    # atol: cos() arguments reach w*t ~ 1e5; float32 range reduction differs
    # between torch's libm and XLA's CPU lowering by up to ~2e-4 near the
    # extrema (both are correct to f32 input precision).
    np.testing.assert_allclose(np.asarray(ours), t2n(theirs), atol=1e-3)


def test_merge_layer_parity():
    from models.modules import MergeLayer as RefMergeLayer

    rng = np.random.default_rng(1)
    x1 = rng.normal(size=(5, 172)).astype(np.float32)
    x2 = rng.normal(size=(5, 172)).astype(np.float32)
    m = MergeLayer(hidden_dim=172, output_dim=1)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x1), jnp.asarray(x2))
    ours = m.apply(params, jnp.asarray(x1), jnp.asarray(x2))

    ref = RefMergeLayer(172, 172, 172, 1)
    p = params["params"]
    set_linear(ref.fc1, p["fc1"]["kernel"], p["fc1"]["bias"])
    set_linear(ref.fc2, p["fc2"]["kernel"], p["fc2"]["bias"])
    ref.eval()
    theirs = ref(torch.from_numpy(x1), torch.from_numpy(x2))
    np.testing.assert_allclose(np.asarray(ours), t2n(theirs), atol=1e-5)


def test_mlp_classifier_parity():
    from models.modules import MLPClassifier as RefMLP

    rng = np.random.default_rng(2)
    x = rng.normal(size=(6, 172)).astype(np.float32)
    m = MLPClassifier(dropout=0.1)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = m.apply(params, jnp.asarray(x), train=False)

    ref = RefMLP(input_dim=172, dropout=0.1)
    p = params["params"]
    for name in ("fc1", "fc2", "fc3"):
        set_linear(getattr(ref, name), p[name]["kernel"], p[name]["bias"])
    ref.eval()
    theirs = ref(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours), t2n(theirs), atol=1e-5)


def test_temporal_multihead_attention_parity():
    from models.modules import MultiHeadAttention as RefMHA

    rng = np.random.default_rng(3)
    b, k, dn, de, dt, h = 9, 11, 172, 172, 100, 2
    node_f = rng.normal(size=(b, dn)).astype(np.float32)
    node_tf = rng.normal(size=(b, 1, dt)).astype(np.float32)
    nbr_f = rng.normal(size=(b, k, dn)).astype(np.float32)
    nbr_tf = rng.normal(size=(b, k, dt)).astype(np.float32)
    nbr_ef = rng.normal(size=(b, k, de)).astype(np.float32)
    nbr_ids = rng.integers(0, 3, size=(b, k))  # zeros = padding
    nbr_ids[0] = 0  # one fully-padded row must stay finite

    m = TemporalMultiHeadAttention(num_heads=h, dropout=0.1)
    params = m.init(
        jax.random.PRNGKey(0),
        jnp.asarray(node_f), jnp.asarray(node_tf[:, 0]), jnp.asarray(nbr_f),
        jnp.asarray(nbr_tf), jnp.asarray(nbr_ef), jnp.asarray(nbr_ids != 0),
    )
    ours, ours_scores = m.apply(
        params,
        jnp.asarray(node_f), jnp.asarray(node_tf[:, 0]), jnp.asarray(nbr_f),
        jnp.asarray(nbr_tf), jnp.asarray(nbr_ef), jnp.asarray(nbr_ids != 0),
        train=False,
    )

    ref = RefMHA(node_feat_dim=dn, edge_feat_dim=de, time_feat_dim=dt,
                 num_heads=h, dropout=0.1)
    p = params["params"]
    set_linear(ref.query_projection, p["query_projection"]["kernel"])
    set_linear(ref.key_projection, p["key_projection"]["kernel"])
    set_linear(ref.value_projection, p["value_projection"]["kernel"])
    set_linear(ref.residual_fc, p["residual_fc"]["kernel"], p["residual_fc"]["bias"])
    with torch.no_grad():
        ref.layer_norm.weight.copy_(torch.from_numpy(np.asarray(p["layer_norm"]["scale"])))
        ref.layer_norm.bias.copy_(torch.from_numpy(np.asarray(p["layer_norm"]["bias"])))
    ref.eval()
    theirs, theirs_scores = ref(
        node_features=torch.from_numpy(node_f),
        node_time_features=torch.from_numpy(node_tf),
        neighbor_node_features=torch.from_numpy(nbr_f),
        neighbor_node_time_features=torch.from_numpy(nbr_tf),
        neighbor_node_edge_features=torch.from_numpy(nbr_ef),
        neighbor_masks=nbr_ids,
    )
    np.testing.assert_allclose(np.asarray(ours), t2n(theirs), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours_scores), t2n(theirs_scores), atol=2e-4)
    assert np.isfinite(np.asarray(ours)).all()


def test_transformer_encoder_parity():
    from models.modules import TransformerEncoder as RefTE

    rng = np.random.default_rng(4)
    b, t, d, h = 5, 13, 64, 4
    x = rng.normal(size=(b, t, d)).astype(np.float32)
    masks = rng.integers(0, 2, size=(b, t))
    masks[:, 0] = 1  # target token always valid (as in TCL/CAWN usage)

    m = TransformerEncoder(attention_dim=d, num_heads=h, dropout=0.1)
    params = m.init(
        jax.random.PRNGKey(0), jnp.asarray(x), None, None, jnp.asarray(masks == 1)
    )
    ours = m.apply(
        params, jnp.asarray(x), None, None, jnp.asarray(masks == 1), train=False
    )

    ref = RefTE(attention_dim=d, num_heads=h, dropout=0.1)
    p = params["params"]
    qk = np.asarray(p["q_proj"]["kernel"]).T
    kk = np.asarray(p["k_proj"]["kernel"]).T
    vk = np.asarray(p["v_proj"]["kernel"]).T
    with torch.no_grad():
        ref.multi_head_attention.in_proj_weight.copy_(
            torch.from_numpy(np.concatenate([qk, kk, vk], axis=0).copy())
        )
        ref.multi_head_attention.in_proj_bias.copy_(
            torch.from_numpy(
                np.concatenate(
                    [p["q_proj"]["bias"], p["k_proj"]["bias"], p["v_proj"]["bias"]]
                ).copy()
            )
        )
    set_linear(ref.multi_head_attention.out_proj, p["out_proj"]["kernel"], p["out_proj"]["bias"])
    set_linear(ref.linear_layers[0], p["ffn1"]["kernel"], p["ffn1"]["bias"])
    set_linear(ref.linear_layers[1], p["ffn2"]["kernel"], p["ffn2"]["bias"])
    with torch.no_grad():
        ref.norm_layers[0].weight.copy_(torch.from_numpy(np.asarray(p["norm1"]["scale"])))
        ref.norm_layers[0].bias.copy_(torch.from_numpy(np.asarray(p["norm1"]["bias"])))
        ref.norm_layers[1].weight.copy_(torch.from_numpy(np.asarray(p["norm2"]["scale"])))
        ref.norm_layers[1].bias.copy_(torch.from_numpy(np.asarray(p["norm2"]["bias"])))
    ref.eval()
    theirs = ref(inputs_query=torch.from_numpy(x), neighbor_masks=masks)
    np.testing.assert_allclose(np.asarray(ours), t2n(theirs), atol=2e-4)
