"""Mid-epoch checkpoint/resume (failure-recovery subsystem, beyond reference)."""
import os

import numpy as np

from dyglib_tpu.models import TGAT
from dyglib_tpu.train import LinkPredictionTrainer, TrainConfig


def test_mid_epoch_resume(link_data, tmp_path):
    save = str(tmp_path / "tgat.pkl")
    cfg = TrainConfig(
        batch_size=200, num_epochs=2, patience=5, learning_rate=1e-3,
        resume_every_batches=3,
    )
    backbone = TGAT(num_neighbors=5, num_layers=1)
    tr = LinkPredictionTrainer(backbone, link_data, cfg, save)
    tr.fit(seed=0, log=lambda *a: None)
    assert os.path.exists(save + ".resume")

    # a fresh trainer resumes from the recorded position and completes
    tr2 = LinkPredictionTrainer(backbone, link_data, cfg, save)
    logs = []
    results = tr2.fit(seed=0, log=logs.append, resume=True)
    assert any("resuming from" in str(m) for m in logs)
    ap = results["test metrics"]["average_precision"]
    assert np.isfinite(ap) and 0.0 < ap <= 1.0
