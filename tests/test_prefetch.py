"""Prefetcher: order preservation, error propagation, pipeline overlap."""

import time

import pytest

from moka_tpu.data.prefetch import ParallelLoader, prefetch


def test_prefetch_order_and_completion():
    out = list(prefetch(iter(range(20)), size=3))
    assert out == list(range(20))


def test_prefetch_propagates_errors():
    def gen():
        yield 1
        raise ValueError("boom")

    it = prefetch(gen(), size=2)
    assert next(it) == 1
    with pytest.raises(ValueError):
        list(it)


class SlowDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        time.sleep(0.01)
        return i


def test_parallel_loader_batches():
    ds = SlowDataset(17)
    loader = ParallelLoader(ds, collate=lambda xs: xs, batch_size=4,
                            workers=8)
    batches = list(loader.epoch(list(range(17))))
    assert len(batches) == 4  # 16 items, drop ragged tail
    assert batches[0] == [0, 1, 2, 3]
    flat = [x for b in batches for x in b]
    assert flat == list(range(16))


def test_parallel_loader_overlaps():
    ds = SlowDataset(32)
    loader = ParallelLoader(ds, collate=lambda xs: xs, batch_size=4,
                            workers=8, prefetch_batches=2)
    t0 = time.perf_counter()
    n = 0
    for batch in loader.epoch(list(range(32))):
        time.sleep(0.02)  # simulated device step
        n += 1
    dt = time.perf_counter() - t0
    # serial would be 32*0.01 + 8*0.02 = 0.48s; overlapped ~0.2s
    assert n == 8
    assert dt < 0.4, dt
