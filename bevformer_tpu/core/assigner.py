"""Hungarian (one-to-one) assignment for DETR-style training.

Mirrors `core/bbox/assigners/hungarian_assigner_3d.py:17-136` +
`core/bbox/match_costs/match_cost.py:7-28`: cost = FocalLossCost(w=2.0) on
class logits + L1 cost (w=0.25) on the first 8 dims of the normalized box
code, solved with scipy `linear_sum_assignment`.

TPU integration: GT boxes are padded to a static `max_gt`. On CPU the solver
runs on host via `jax.pure_callback` (exact scipy); on TPU runtimes without
host-callback support (axon PJRT) the exact on-device Hungarian from
`core/lap.py` is used — both produce optimal assignments (tests verify
agreement).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bevformer_tpu.core.boxes import normalize_bbox


def focal_cls_cost(
    cls_pred: jnp.ndarray,  # [Q, C] logits
    gt_labels: jnp.ndarray,  # [G] int
    alpha: float = 0.25,
    gamma: float = 2.0,
    weight: float = 2.0,
    eps: float = 1e-12,
) -> jnp.ndarray:
    p = jax.nn.sigmoid(cls_pred.astype(jnp.float32))
    neg = -jnp.log(1.0 - p + eps) * (1.0 - alpha) * jnp.power(p, gamma)
    pos = -jnp.log(p + eps) * alpha * jnp.power(1.0 - p, gamma)
    cost = pos[:, gt_labels] - neg[:, gt_labels]  # [Q, G]
    return cost * weight


def bbox3d_l1_cost(
    bbox_pred: jnp.ndarray,  # [Q, 10] network code
    gt_normalized: jnp.ndarray,  # [G, 10] normalized gt code
    weight: float = 0.25,
) -> jnp.ndarray:
    # first 8 dims only (`hungarian_assigner_3d.py:113`)
    diff = jnp.abs(
        bbox_pred[:, None, :8].astype(jnp.float32)
        - gt_normalized[None, :, :8].astype(jnp.float32)
    )
    return diff.sum(-1) * weight


def _lsa_host(cost: np.ndarray, num_gt: np.ndarray) -> np.ndarray:
    """cost [B, Q, G], num_gt [B] -> assigned gt index per query [B, Q]
    (-1 = background)."""
    from scipy.optimize import linear_sum_assignment

    cost = np.nan_to_num(
        np.asarray(cost, np.float64), nan=1e8, posinf=1e8, neginf=-1e8
    )
    b, q, _ = cost.shape
    out = np.full((b, q), -1, np.int32)
    for i in range(b):
        g = int(num_gt[i])
        if g <= 0:
            continue
        rows, cols = linear_sum_assignment(cost[i, :, :g])
        out[i, rows] = cols.astype(np.int32)
    return out


def hungarian_match(
    cls_pred: jnp.ndarray,  # [B, Q, C] logits
    bbox_pred: jnp.ndarray,  # [B, Q, 10]
    gt_boxes: jnp.ndarray,  # [B, G, 9] metric (gravity-center z), padded
    gt_labels: jnp.ndarray,  # [B, G] int, padded
    num_gt: jnp.ndarray,  # [B] int
    *,
    cls_weight: float = 2.0,
    bbox_weight: float = 0.25,
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
    impl: str = "auto",
) -> jnp.ndarray:
    """Returns assigned gt index per query [B, Q] (-1 = background)."""
    b, q, _ = cls_pred.shape
    g = gt_boxes.shape[1]
    gt_norm = normalize_bbox(gt_boxes)

    def one(cp, bp, gn, gl):
        return focal_cls_cost(
            cp, gl, alpha=focal_alpha, gamma=focal_gamma, weight=cls_weight
        ) + bbox3d_l1_cost(bp, gn, weight=bbox_weight)

    cost = jax.vmap(one)(cls_pred, bbox_pred, gt_norm, gt_labels)  # [B, Q, G]
    # more GTs than queries is infeasible for the matcher (the on-device
    # augmenting-path loop would never terminate -> TPU watchdog kills the
    # worker); match only the first Q GTs — degenerate toy configs only
    num_gt = jnp.minimum(num_gt, q)
    # mask out padded gt columns so the solver never prefers them
    col_valid = jnp.arange(g)[None, :] < num_gt[:, None]
    cost = jnp.where(col_valid[:, None, :], cost, 1e8)
    # matching is discrete: no gradient flows through the cost
    # (`hungarian_assigner_3d.py:119` detaches before the CPU solve)
    cost = jax.lax.stop_gradient(cost)

    if impl == "auto":
        import os

        # host callbacks inside jit are unsupported on some TPU runtimes
        # (axon PJRT); solve on device there, use exact scipy on CPU.
        # BEVFORMER_LAP_IMPL overrides (the multi-chip dryrun forces
        # 'device' so the CPU mesh compiles the same matcher a TPU mesh
        # would — pure_callback pins to device 0 and forces SPMD
        # resharding/rematerialization around it)
        impl = os.environ.get(
            "BEVFORMER_LAP_IMPL",
            "scipy" if jax.default_backend() == "cpu" else "device",
        )

    if impl == "scipy":
        return jax.pure_callback(
            _lsa_host,
            jax.ShapeDtypeStruct((b, q), jnp.int32),
            cost,
            num_gt,
            vmap_method="sequential",
        )

    from bevformer_tpu.core.lap import assignment_to_per_query, hungarian_assign

    assigned_q = jax.vmap(lambda c, n: hungarian_assign(c, n))(cost, num_gt)
    return jax.vmap(lambda a: assignment_to_per_query(a, q))(assigned_q)
