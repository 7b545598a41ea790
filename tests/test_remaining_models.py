"""TCL, DyGFormer, CAWN end-to-end + EdgeBank semantics."""
import numpy as np
import pytest

from dyglib_tpu.models import (
    CAWN,
    DyGFormer,
    TCL,
    edge_bank_link_prediction,
)
from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig


def _fit(backbone, link_data, tmp_path, epochs=2, lr=1e-3):
    cfg = TrainConfig(
        batch_size=200, num_epochs=epochs, patience=5, learning_rate=lr
    )
    trainer = LinkPredictionTrainer(
        backbone, link_data, cfg, str(tmp_path / "ck.pkl")
    )
    return trainer.fit(seed=0, log=lambda *a: None)


@pytest.mark.slow
def test_tcl_end_to_end(link_data, tmp_path):
    # TCL is a slow learner on this task — assert on the training signal
    # (loss must fall) plus a loose AP sanity bound. With torch-matching
    # init (nn.modules.TorchLinear) the first epoch already starts near
    # ln 2 instead of ~1.1, so the RELATIVE decrease over 4 epochs is
    # smaller than under the old flax-default init even though absolute
    # convergence is strictly better (scripts/reference_calibration.py)
    from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig
    import jax

    cfg = TrainConfig(batch_size=200, num_epochs=4, patience=5, learning_rate=1e-3)
    trainer = LinkPredictionTrainer(
        TCL(num_neighbors=10, num_layers=2), link_data, cfg, str(tmp_path / "tcl.pkl")
    )
    params, opt_state = trainer.init_params(0)
    first_losses = last_losses = None
    for epoch in range(cfg.num_epochs):
        params, opt_state, _, losses, _ = trainer.train_epoch(
            params, opt_state, None, epoch, jax.random.PRNGKey(0)
        )
        if first_losses is None:
            first_losses = losses
        last_losses = losses
    assert np.mean(last_losses) < 0.93 * np.mean(first_losses)
    assert np.mean(last_losses) < 0.69  # below chance-level BCE
    _, test_metrics, _ = trainer.evaluate(
        params, link_data.test, trainer.test_neg, 2
    )
    ap = trainer.mean_metrics(test_metrics)["average_precision"]
    # band floor (tests/calibration_fixture.json): ours 0.6887 +- 0.0426,
    # ref 0.6820 +- 0.0170 -> mean - 3.25 sigma ~ 0.55 (the old 0.45 was
    # insensitive). NOTE: the band protocol selects test-at-best-val over
    # 4 epochs; this test evaluates the FINAL epoch without selection, so
    # keep a small extra margin.
    assert np.isfinite(ap) and ap > 0.53, f"TCL test AP {ap}"


@pytest.mark.slow
def test_dygformer_end_to_end(link_data, tmp_path):
    results = _fit(
        DyGFormer(max_input_sequence_length=32, patch_size=2, num_layers=2),
        link_data, tmp_path, epochs=4, lr=5e-4,
    )
    ap = results["test metrics"]["average_precision"]
    # Band-derived floor (tests/calibration_fixture.json, this exact
    # protocol): ours 0.6642 +- 0.0503 over 5 seeds, ref 0.6580 +- 0.0174
    # — floor = mean - 3.25 sigma ~ 0.50. The per-seed spread at this tiny
    # 2k-edge operating point is genuinely ~0.05 AND environment-sensitive
    # (same seed scored 0.688 on 1 CPU device, 0.598 on the suite's
    # 8-virtual-device mesh — reduction-order drift over 4 epochs), which
    # is what made the old hand-guessed 0.62 floor flake (VERDICT r2 weak
    # #4). Regression sensitivity comes from the training-signal assert
    # below + the full-model transplant parity suite, not from this noisy
    # end metric.
    # round-4 band (shipped protocol): ours 0.6368 +- 0.0438, ref
    # 0.6316 +- 0.0208 -> floor mean - 3 sigma = 0.505
    assert ap > 0.50, f"DyGFormer test AP {ap}"
    # training signal: clearly below chance-level BCE (ln 2 ~ 0.693). A
    # relative first-vs-last decrease is the wrong check here — the
    # co-occurrence channel converges within epoch 1 on this fixture, so
    # epoch means are flat-at-converged across epochs.
    # measured at this operating point: epoch-mean losses run 0.62-0.69
    # (lr 5e-4, 1.4k train edges); a broken model sits pinned at ~0.693
    losses = results["train losses"]
    assert min(losses) < 0.67, f"DyGFormer train losses never left chance: {losses}"


@pytest.mark.slow
def test_cawn_end_to_end(link_data, tmp_path):
    # tiny walk config: CAWN's BiLSTM-over-walks is O(B * K^L) LSTM steps
    # and dominates CPU time at production sizes (true of the reference
    # too); K=8, L=1 keeps the CPU test fast while exercising every path
    results = _fit(
        CAWN(num_neighbors=8, walk_length=1, num_walk_heads=8),
        link_data, tmp_path,
    )
    ap = results["test metrics"]["average_precision"]
    # band floor (tests/calibration_fixture.json): ours 0.6605 +- 0.0338,
    # ref 0.6557 +- 0.0350 -> mean - 3.25 sigma ~ 0.55
    # round-4 band (shipped protocol): ours 0.6950 +- 0.0381, ref
    # 0.6811 +- 0.0433 -> floor mean - 3 sigma = 0.581
    assert ap > 0.58 and np.isfinite(ap), f"CAWN test AP {ap}"


def test_edgebank_modes(link_data):
    d = link_data
    history = d.train
    pos = (d.val.src[:300], d.val.dst[:300])
    rng = np.random.default_rng(0)
    neg = (
        rng.choice(np.unique(history.src), 300),
        rng.choice(np.unique(history.dst), 300),
    )
    for mode, twm in [
        ("unlimited_memory", "fixed_proportion"),
        ("time_window_memory", "fixed_proportion"),
        ("time_window_memory", "repeat_interval"),
        ("repeat_threshold_memory", "fixed_proportion"),
    ]:
        pp, np_ = edge_bank_link_prediction(
            history, pos, neg, edge_bank_memory_mode=mode, time_window_mode=twm
        )
        assert set(np.unique(pp)) <= {0.0, 1.0}
        assert len(pp) == 300 and len(np_) == 300
    # unlimited memory must recall every historical edge exactly
    pp, _ = edge_bank_link_prediction(
        history, (history.src[:100], history.dst[:100]), neg,
        edge_bank_memory_mode="unlimited_memory",
    )
    assert pp.all()
    # repeat-heavy synthetic val edges: unlimited memory should score well
    pp, np_ = edge_bank_link_prediction(history, pos, neg)
    from dyglib_tpu.train.metrics import average_precision

    labels = np.r_[np.ones(300), np.zeros(300)]
    preds = np.r_[pp, np_]
    assert average_precision(labels, preds) > 0.55


@pytest.mark.slow
def test_cawn_position_counts_oracle(link_data):
    """walk_position_counts == the reference PositionEncoder's dict counting
    (CAWN.py:197-289): occurrences of each walk entry's node at hop h of
    each side's tree, divided by the hop's table width."""
    from collections import Counter

    import jax
    import jax.numpy as jnp

    from dyglib_tpu.graph import build_temporal_csr
    from dyglib_tpu.graph.csr import time_keys
    from dyglib_tpu.models.cawn import CAWN, walk_position_counts

    csr = build_temporal_csr(
        link_data.full, num_nodes=link_data.num_nodes,
        time_scaling_factor=1e-6, with_tia=True,
    )
    m = CAWN(num_neighbors=4, walk_length=2)
    tr = link_data.train
    b = 6
    ids = jnp.asarray(
        np.concatenate([tr.src[:b], tr.dst[:b], tr.src[b:2*b], tr.dst[b:2*b]]),
        jnp.int32,
    )
    ts = jnp.tile(jnp.asarray(time_keys(tr.ts[200:200 + b]), jnp.int32), 4)
    inputs = m.sample(csr, ids, ts, jax.random.PRNGKey(3))

    ours = np.asarray(
        walk_position_counts(inputs.walk_ids, inputs.hop_ids, link_data.num_nodes)
    )

    walk_ids = np.asarray(inputs.walk_ids)
    hop_ids = [np.asarray(h) for h in inputs.hop_ids]
    mq, w, lp1 = walk_ids.shape
    li = list(range(b)) + list(range(2 * b, 3 * b))
    ri = list(range(b, 2 * b)) + list(range(3 * b, 4 * b))
    pair_rows = {}
    for pidx, (l, r) in enumerate(zip(li, ri)):
        pair_rows[l] = (l, r)
        pair_rows[r] = (l, r)
    expected = np.zeros_like(ours)
    for q in range(mq):
        lrow, rrow = pair_rows[q]
        for s, row in enumerate((lrow, rrow)):
            for h in range(lp1):
                occ = hop_ids[h][row]
                cnt = Counter(occ.tolist())
                for wi in range(w):
                    for st in range(lp1):
                        n = int(walk_ids[q, wi, st])
                        if n != 0:
                            expected[q, wi, st, s, h] = cnt.get(n, 0) / len(occ)
    np.testing.assert_allclose(ours, expected, atol=1e-6)


@pytest.mark.slow
def test_cawn_position_counts_paths_agree(link_data):
    """Equality-reduce fast path == sorted-join fallback."""
    import jax
    import jax.numpy as jnp

    from dyglib_tpu.graph import build_temporal_csr
    from dyglib_tpu.graph.csr import time_keys
    from dyglib_tpu.models.cawn import (
        CAWN,
        _walk_position_counts_join,
        walk_position_counts,
    )

    csr = build_temporal_csr(
        link_data.full, num_nodes=link_data.num_nodes,
        time_scaling_factor=1e-6, with_tia=True,
    )
    m = CAWN(num_neighbors=5, walk_length=2)
    tr = link_data.train
    b = 4
    ids = jnp.asarray(
        np.concatenate([tr.src[:b], tr.dst[:b], tr.src[b:2*b], tr.dst[b:2*b]]),
        jnp.int32,
    )
    ts = jnp.tile(jnp.asarray(time_keys(tr.ts[300:300 + b]), jnp.int32), 4)
    inputs = m.sample(csr, ids, ts, jax.random.PRNGKey(9))
    fast = walk_position_counts(inputs.walk_ids, inputs.hop_ids, link_data.num_nodes)
    join = jnp.where(
        (inputs.walk_ids != 0)[..., None, None],
        _walk_position_counts_join(
            inputs.walk_ids, inputs.hop_ids, link_data.num_nodes
        ),
        0.0,
    )
    np.testing.assert_allclose(np.asarray(fast), np.asarray(join), atol=1e-6)
