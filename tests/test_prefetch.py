"""Prefetch iterator: ordering, exhaustion, exception propagation."""

import time

import pytest

from loco_asr_tpu.utils.prefetch import prefetch


def test_prefetch_preserves_order():
    assert list(prefetch(range(100), depth=4)) == list(range(100))


def test_prefetch_overlaps_production():
    """The producer must run ahead WITHOUT any consumption — checked
    structurally (items land in the buffer before the first __next__), not
    by wall-clock margins, which flake on this one-core box."""
    produced = []

    def source():
        for i in range(5):
            produced.append(i)
            yield i

    it = prefetch(source(), depth=5)
    deadline = time.time() + 10.0
    while len(produced) < 5 and time.time() < deadline:
        time.sleep(0.01)
    assert len(produced) == 5  # fully buffered ahead of consumption
    assert list(it) == list(range(5))


def test_prefetch_propagates_exceptions():
    def bad():
        yield 1
        raise ValueError("boom")

    it = prefetch(bad())
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)
