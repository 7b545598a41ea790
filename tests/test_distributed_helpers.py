"""Multi-host slicing math: exact disjoint cover of every global batch."""
import numpy as np
import pytest

from dyglib_tpu.parallel.distributed import host_batch_slice, initialize_distributed


@pytest.mark.parametrize("b,p", [(200, 1), (200, 4), (200, 7), (8, 8), (5, 8)])
def test_host_batch_slices_partition_exactly(b, p):
    covered = np.zeros(b, dtype=int)
    for i in range(p):
        off, ln = host_batch_slice(b, i, p)
        covered[off : off + ln] += 1
        assert ln in (b // p, b // p + 1)
    assert (covered == 1).all()


def test_initialize_single_process_noop():
    idx, count = initialize_distributed()
    assert idx == 0 and count >= 1
