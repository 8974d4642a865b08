"""On-device Hungarian vs scipy: exact agreement."""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from bevformer_tpu.core.lap import assignment_to_per_query, hungarian_assign


def _check(cost, num_gt, tol=1e-4):
    got = np.asarray(hungarian_assign(jnp.array(cost), jnp.int32(num_gt)))
    rows, cols = linear_sum_assignment(cost[:, :num_gt])
    want = np.full(cost.shape[1], -1)
    want[cols] = rows
    # assignments must be a valid matching of all gts
    assert (got[:num_gt] >= 0).all()
    assert len(set(got[:num_gt].tolist())) == num_gt
    assert (got[num_gt:] == -1).all()
    # and achieve the same optimal total cost (assignments may differ only
    # when costs are degenerate)
    got_total = cost[got[:num_gt], np.arange(num_gt)].sum()
    want_total = cost[rows, cols].sum()
    assert got_total <= want_total + tol * max(1, abs(want_total)), (
        got_total, want_total,
    )


def test_small_random():
    rng = np.random.RandomState(0)
    for trial in range(20):
        q = rng.randint(5, 60)
        g = rng.randint(1, min(q, 20))
        gmax = g + rng.randint(0, 5)
        cost = rng.randn(q, gmax).astype(np.float32) * rng.uniform(0.1, 50)
        _check(cost, g)


def test_large_like_real():
    rng = np.random.RandomState(1)
    cost = rng.randn(900, 48).astype(np.float32) * 4
    _check(cost, 40)


def test_zero_gt():
    cost = np.random.RandomState(2).randn(10, 4).astype(np.float32)
    got = np.asarray(hungarian_assign(jnp.array(cost), jnp.int32(0)))
    assert (got == -1).all()


def test_per_query_conversion():
    assigned_q = jnp.array([3, 0, -1], jnp.int32)
    per_q = np.asarray(assignment_to_per_query(assigned_q, 5))
    assert per_q[3] == 0 and per_q[0] == 1
    assert (per_q[[1, 2, 4]] == -1).all()


def test_matches_scipy_exactly_nondegenerate():
    """With well-separated costs the argmin assignment itself must match."""
    rng = np.random.RandomState(3)
    for _ in range(10):
        cost = rng.rand(50, 8).astype(np.float32) * 100
        got = np.asarray(hungarian_assign(jnp.array(cost), jnp.int32(8)))
        rows, cols = linear_sum_assignment(cost)
        want = np.full(8, -1)
        want[cols] = rows
        np.testing.assert_array_equal(got, want)
