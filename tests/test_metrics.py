"""AP / ROC-AUC parity vs brute-force definitions (sklearn semantics)."""
import numpy as np
import pytest

from dyglib_tpu.train.metrics import average_precision, roc_auc


def brute_roc_auc(y, s):
    """Pairwise Mann-Whitney definition."""
    pos = s[y == 1]
    neg = s[y == 0]
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    return (wins + 0.5 * ties) / (len(pos) * len(neg))


def brute_ap(y, s):
    """Direct sum over positive ranks with tie grouping."""
    order = np.argsort(-s, kind="mergesort")
    y, s = y[order], s[order]
    # group by distinct score
    ap, tp_prev = 0.0, 0.0
    n_pos = y.sum()
    i = 0
    while i < len(y):
        j = i
        while j + 1 < len(y) and s[j + 1] == s[i]:
            j += 1
        tp = y[: j + 1].sum()
        prec = tp / (j + 1)
        ap += (tp - tp_prev) / n_pos * prec
        tp_prev = tp
        i = j + 1
    return ap


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("with_ties", [False, True])
def test_metrics_match_bruteforce(seed, with_ties):
    rng = np.random.default_rng(seed)
    n = 257
    y = (rng.uniform(size=n) < 0.3).astype(np.float64)
    y[0], y[1] = 1.0, 0.0  # ensure both classes present
    s = rng.uniform(size=n)
    if with_ties:
        s = np.round(s, 1)
    assert roc_auc(y, s) == pytest.approx(brute_roc_auc(y, s), abs=1e-12)
    assert average_precision(y, s) == pytest.approx(brute_ap(y, s), abs=1e-12)


def test_perfect_and_inverted():
    y = np.array([1, 1, 0, 0], dtype=float)
    s = np.array([0.9, 0.8, 0.2, 0.1])
    assert roc_auc(y, s) == 1.0
    assert average_precision(y, s) == 1.0
    assert roc_auc(y, -s) == 0.0


def test_sklearn_parity_if_available():
    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(42)
    y = (rng.uniform(size=500) < 0.4).astype(float)
    s = np.round(rng.uniform(size=500), 2)
    assert roc_auc(y, s) == pytest.approx(sklearn.roc_auc_score(y, s), abs=1e-12)
    assert average_precision(y, s) == pytest.approx(
        sklearn.average_precision_score(y, s), abs=1e-12
    )
