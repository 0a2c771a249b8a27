"""Prefetch iterator: ordering, exhaustion, exception propagation."""

import time

import pytest

from loco_asr_tpu.utils.prefetch import prefetch


def test_prefetch_preserves_order():
    assert list(prefetch(range(100), depth=4)) == list(range(100))


def test_prefetch_overlaps_production():
    def slow_source():
        for i in range(5):
            time.sleep(0.02)
            yield i

    it = prefetch(slow_source(), depth=5)
    time.sleep(0.15)  # producer should have buffered everything by now
    t0 = time.perf_counter()
    out = list(it)
    assert out == list(range(5))
    assert time.perf_counter() - t0 < 0.05  # consumption is instant


def test_prefetch_propagates_exceptions():
    def bad():
        yield 1
        raise ValueError("boom")

    it = prefetch(bad())
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)
