"""Round-planner unit tests (device planning path edge cases)."""

import numpy as np
import jax.numpy as jnp
import pytest

from slamem_tpu.engine.seed_mode import plan_blocks_on_device


def plan(widths, capacity, block):
    w = np.asarray(widths, np.int64)
    cum = jnp.asarray(np.cumsum(w))
    summary = np.array([int(w.sum()), int(w.max()) if w.size else 0])
    return plan_blocks_on_device(cum, summary, capacity, block, len(w))


def check_valid(blocks, widths, capacity, block, m):
    # full coverage, no overlaps, in order, capacity respected
    assert blocks[0][0] == 0 and blocks[-1][1] == m
    for (a, b), (c, d) in zip(blocks, blocks[1:]):
        assert b == c and a < b
    w = np.asarray(widths)
    for a, b in blocks:
        assert b - a <= block
        assert w[a:b].sum() <= capacity


def test_plan_uniform():
    widths = [2] * 100
    blocks = plan(widths, capacity=50, block=100)
    check_valid(blocks, widths, 50, 100, 100)


def test_plan_empty():
    # zero total pairs -> zero rounds (nothing to expand)
    assert plan([0] * 50, capacity=10, block=8) == []


def test_plan_spiky():
    rng = np.random.default_rng(7)
    widths = rng.integers(0, 9, size=500)
    widths[100] = 40
    blocks = plan(widths, capacity=64, block=64)
    check_valid(blocks, widths, 64, 64, 500)


def test_plan_single_wide_position():
    widths = [1, 63, 1]
    blocks = plan(widths, capacity=64, block=16)
    check_valid(blocks, widths, 64, 16, 3)


def test_plan_overflow_raises():
    with pytest.raises(NotImplementedError):
        plan([5, 200, 5], capacity=100, block=16)
