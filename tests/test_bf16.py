"""bfloat16 compute-dtype path: finite, close to f32, trainable."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from dyglib_tpu.models import DyGFormer, TGAT
from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig


@pytest.mark.slow
def test_dygformer_bf16_close_to_f32(link_data, tmp_path):
    cfgs = {}
    for dtype in ("float32", "bfloat16"):
        backbone = DyGFormer(
            max_input_sequence_length=32, patch_size=2, num_layers=2,
            compute_dtype=dtype,
        )
        tr = LinkPredictionTrainer(
            backbone, link_data, TrainConfig(batch_size=64),
            str(tmp_path / f"{dtype}.pkl"),
        )
        params, _ = tr.init_params(0)
        b = tr.data.train
        from dyglib_tpu.graph.csr import time_keys

        batch = (
            jnp.asarray(b.src[:64], jnp.int32), jnp.asarray(b.dst[:64], jnp.int32),
            jnp.asarray(b.src[:64], jnp.int32), jnp.asarray(b.dst[64:128], jnp.int32),
            jnp.asarray(time_keys(b.ts[:64]), jnp.int32),
            jnp.asarray(b.eid[:64], jnp.int32), jnp.ones((64,), jnp.float32),
        )
        loss, probs, _ = tr.eval_step(params, None, tr.full_csr, batch, jax.random.PRNGKey(0))
        cfgs[dtype] = (float(loss), np.asarray(probs[0]))
    l32, p32 = cfgs["float32"]
    l16, p16 = cfgs["bfloat16"]
    assert np.isfinite(l16)
    assert abs(l16 - l32) < 0.05
    assert np.abs(p16 - p32).max() < 0.1  # bf16 has ~3 decimal digits


def test_tgat_bf16_trains(link_data, tmp_path):
    backbone = TGAT(num_neighbors=5, num_layers=1, compute_dtype="bfloat16")
    cfg = TrainConfig(batch_size=200, num_epochs=1, learning_rate=1e-3)
    tr = LinkPredictionTrainer(backbone, link_data, cfg, str(tmp_path / "b.pkl"))
    params, opt_state = tr.init_params(0)
    params, opt_state, _, losses, _ = tr.train_epoch(
        params, opt_state, None, 0, jax.random.PRNGKey(0)
    )
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] + 0.1  # moving, not diverging
