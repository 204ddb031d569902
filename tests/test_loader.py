"""PrefetchLoader: ordering, laziness, striding, error propagation."""

import threading
import time

import numpy as np
import pytest

from pgdvs_tpu.data.loader import PrefetchLoader, device_put_prefetch


class _SlowDataset:
    def __init__(self, n=10, delay=0.02):
        self.n = n
        self.delay = delay
        self.calls = []
        self.lock = threading.Lock()

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        time.sleep(self.delay)
        with self.lock:
            self.calls.append(i)
        return {"idx": i, "arr": np.full((4,), i, np.float32)}


def test_order_preserved_with_workers():
    ds = _SlowDataset(12)
    out = [item["idx"] for item in PrefetchLoader(ds, n_workers=3)]
    assert out == list(range(12))
    assert sorted(ds.calls) == list(range(12))


def test_indices_striding():
    ds = _SlowDataset(10)
    out = [it["idx"] for it in PrefetchLoader(ds, indices=range(1, 10, 3))]
    assert out == [1, 4, 7]


def test_lookahead_bounds_materialization():
    ds = _SlowDataset(20, delay=0.0)
    loader = PrefetchLoader(ds, n_workers=2, lookahead=3)
    it = iter(loader)
    next(it)
    time.sleep(0.1)
    # after one consume, at most 1 + lookahead items were ever fetched
    assert len(ds.calls) <= 1 + 3 + 2  # + in-flight worker slack


def test_prefetch_overlaps_work():
    """Wall time ~ max(consumer, producer), not their sum."""
    ds = _SlowDataset(8, delay=0.03)
    t0 = time.time()
    for _ in PrefetchLoader(ds, n_workers=2, lookahead=4):
        time.sleep(0.03)  # consumer work
    overlapped = time.time() - t0
    t0 = time.time()
    for _ in PrefetchLoader(ds, n_workers=0):
        time.sleep(0.03)
    serial = time.time() - t0
    assert overlapped < serial * 0.85, (overlapped, serial)


def test_iterable_pipeline_and_error_propagation():
    def gen():
        yield {"idx": 0}
        yield {"idx": 1}
        raise RuntimeError("boom")

    loader = PrefetchLoader(gen(), n_workers=2)
    it = iter(loader)
    assert next(it)["idx"] == 0
    assert next(it)["idx"] == 1
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_device_put_prefetch_roundtrip():
    ds = _SlowDataset(5, delay=0.0)
    out = list(device_put_prefetch(PrefetchLoader(ds, n_workers=2)))
    assert [int(o["idx"]) for o in out] == list(range(5))
    np.testing.assert_allclose(np.asarray(out[3]["arr"]), 3.0)
