"""Negative edge sampler semantics (reference utils/utils.py:305-495)."""
import numpy as np

from dyglib_tpu.graph import NegativeEdgeSampler


def _stream(link_data):
    d = link_data
    return d.full.src, d.full.dst, d.full.ts


def test_random_sample_from_unique_tables(link_data):
    src, dst, ts = _stream(link_data)
    s = NegativeEdgeSampler(src, dst, seed=0)
    ns, nd = s.sample(500)
    assert set(ns) <= set(np.unique(src))
    assert set(nd) <= set(np.unique(dst))


def test_seeded_reset_reproduces_stream(link_data):
    src, dst, ts = _stream(link_data)
    s = NegativeEdgeSampler(src, dst, seed=42)
    a = s.sample(100)
    s.reset_random_state()
    b = s.sample(100)
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])


def test_historical_negatives_are_past_edges_not_in_batch(link_data):
    src, dst, ts = _stream(link_data)
    s = NegativeEdgeSampler(
        src, dst, interact_times=ts, negative_sample_strategy="historical", seed=1
    )
    n = len(src)
    b0, b1 = int(0.6 * n), int(0.6 * n) + 100
    bs, bd = src[b0:b1], dst[b0:b1]
    t_start, t_end = ts[b0], ts[b1 - 1]
    size = 100
    ns, nd = s.sample(size, bs, bd, t_start, t_end)
    assert len(ns) == size
    past = set(zip(src[ts < t_start].tolist(), dst[ts < t_start].tolist()))
    batch = set(zip(bs.tolist(), bd.tolist()))
    hist_hits = sum((a, b) in past for a, b in zip(ns, nd))
    batch_hits = sum((a, b) in batch for a, b in zip(ns, nd))
    # pool is large here, so all picks should be historical; none from batch
    assert batch_hits == 0
    assert hist_hits >= 0.9 * size


def test_inductive_excludes_train_observed(link_data):
    src, dst, ts = _stream(link_data)
    cut = np.quantile(ts, 0.7)
    s = NegativeEdgeSampler(
        src,
        dst,
        interact_times=ts,
        last_observed_time=float(cut),
        negative_sample_strategy="inductive",
        seed=2,
    )
    n = len(src)
    b0, b1 = int(0.9 * n), int(0.9 * n) + 50
    ns, nd = s.sample(50, src[b0:b1], dst[b0:b1], ts[b0], ts[b1 - 1])
    observed = s.observed_edges
    batch = set(zip(src[b0:b1].tolist(), dst[b0:b1].tolist()))
    pool = s.get_unique_edges_between_start_end_time(s.earliest_time, ts[b0])
    pool = pool - observed - batch
    # every inductive pick is either from the inductive pool or a random fill
    in_pool = sum((a, b) in pool for a, b in zip(ns, nd))
    in_observed = sum((a, b) in observed for a, b in zip(ns, nd))
    if len(pool) >= 50:
        assert in_observed == 0 and in_pool == 50


def test_historical_tops_up_when_pool_small(link_data):
    src, dst, ts = _stream(link_data)
    s = NegativeEdgeSampler(
        src, dst, interact_times=ts, negative_sample_strategy="historical", seed=3
    )
    # batch at the very beginning: no history yet -> all random fill
    ns, nd = s.sample(20, src[:10], dst[:10], ts[0], ts[9])
    assert len(ns) == 20
    batch = set(zip(src[:10].tolist(), dst[:10].tolist()))
    assert all((a, b) not in batch for a, b in zip(ns, nd))
