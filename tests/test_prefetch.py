"""Async input pipeline tests (PrefetchLoader / iter_prefetched)."""
import time

import numpy as np
import pytest

from sam6d_tpu.data.prefetch import PrefetchLoader, iter_prefetched


def test_prefetch_loader_produces_batches():
    def make_batch(rng):
        return {"x": rng.rand(4, 3)}

    with PrefetchLoader(make_batch, num_workers=3, depth=4, seed=7) as loader:
        batches = [loader.get() for _ in range(10)]
    assert len(batches) == 10
    for b in batches:
        assert b["x"].shape == (4, 3)
    # distinct worker seeds -> not all batches identical
    assert len({b["x"].tobytes() for b in batches}) > 1


def test_prefetch_loader_surfaces_worker_errors():
    def broken(rng):
        raise ValueError("boom")

    loader = PrefetchLoader(broken, num_workers=1, depth=2)
    with pytest.raises(ValueError, match="boom"):
        loader.get()
    loader.close()


def test_prefetch_loader_raises_after_all_workers_die():
    """Once every worker has crashed and its exception was consumed, get()
    must error out (not block forever on the empty queue)."""
    def broken(rng):
        raise ValueError("boom")

    loader = PrefetchLoader(broken, num_workers=2, depth=4)
    seen = 0
    with pytest.raises((ValueError, RuntimeError)):
        for _ in range(5):  # more gets than workers -> must hit RuntimeError
            try:
                loader.get()
            except ValueError:
                seen += 1  # each worker's own exception
                continue
    assert seen <= 2
    loader.close()


def test_prefetch_loader_overlaps_production():
    """With 4 workers each taking ~20ms, consuming 8 batches should take
    well under the serial 160ms."""
    def slow(rng):
        time.sleep(0.02)
        return rng.rand(2)

    with PrefetchLoader(slow, num_workers=4, depth=8) as loader:
        time.sleep(0.15)  # let the queue fill
        t0 = time.time()
        for _ in range(8):
            loader.get()
        elapsed = time.time() - t0
    assert elapsed < 0.12, f"no overlap: {elapsed:.3f}s"


def test_iter_prefetched_order_and_completion():
    items = list(range(20))
    out = list(iter_prefetched(iter(items), depth=3))
    assert out == items


def test_iter_prefetched_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("io failed")

    it = iter_prefetched(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="io failed"):
        list(it)
