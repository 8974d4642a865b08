"""3D box codecs and utilities (pure jnp).

Semantics mirror the reference's 10-dim network box code
(`/root/reference/projects/mmdet3d_plugin/core/bbox/util.py:4-53`):

  network code: (cx, cy, log w, log l, cz, log h, sin yaw, cos yaw, vx, vy)
  metric box  : (cx, cy, cz, w, l, h, yaw, vx, vy)

Ground-truth boxes throughout this framework are 9-dim metric boxes whose z is
the *gravity center* (the reference converts LiDARInstance3DBoxes bottom-center
z to gravity center before loss, `dense_heads/bevformer_head.py:441-443`; the
decode path shifts back to bottom z, `bevformer_head.py:500`).
"""

from __future__ import annotations

import jax.numpy as jnp

# nuScenes 10-class detection names, order fixed by the reference configs
# (`/root/reference/projects/configs/bevformer/bevformer_base.py` class_names).
CLASS_NAMES = (
    "car",
    "truck",
    "construction_vehicle",
    "bus",
    "trailer",
    "barrier",
    "motorcycle",
    "bicycle",
    "pedestrian",
    "traffic_cone",
)

# Per-dim weights on the 10-dim code; velocity dims are down-weighted
# (`dense_heads/bevformer_head.py:52-57`).
DEFAULT_CODE_WEIGHTS = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2)


def normalize_bbox(bboxes: jnp.ndarray, pc_range=None) -> jnp.ndarray:
    """Metric 9-dim (or 7-dim) box -> 10-dim (or 8-dim) network code.

    Matches `core/bbox/util.py:4-24` in the reference: log-sizes and
    yaw -> (sin, cos). `pc_range` is accepted for signature parity but unused,
    exactly as in the reference.
    """
    cx = bboxes[..., 0:1]
    cy = bboxes[..., 1:2]
    cz = bboxes[..., 2:3]
    w = jnp.log(bboxes[..., 3:4])
    l = jnp.log(bboxes[..., 4:5])
    h = jnp.log(bboxes[..., 5:6])
    rot = bboxes[..., 6:7]
    parts = [cx, cy, w, l, cz, h, jnp.sin(rot), jnp.cos(rot)]
    if bboxes.shape[-1] > 7:
        parts += [bboxes[..., 7:8], bboxes[..., 8:9]]
    return jnp.concatenate(parts, axis=-1)


def denormalize_bbox(normalized: jnp.ndarray, pc_range=None) -> jnp.ndarray:
    """10-dim (or 8-dim) network code -> metric 9-dim (or 7-dim) box.

    Matches `core/bbox/util.py:26-53`.
    """
    rot = jnp.arctan2(normalized[..., 6:7], normalized[..., 7:8])
    cx = normalized[..., 0:1]
    cy = normalized[..., 1:2]
    cz = normalized[..., 4:5]
    w = jnp.exp(normalized[..., 2:3])
    l = jnp.exp(normalized[..., 3:4])
    h = jnp.exp(normalized[..., 5:6])
    parts = [cx, cy, cz, w, l, h, rot]
    if normalized.shape[-1] > 8:
        parts += [normalized[..., 8:9], normalized[..., 9:10]]
    return jnp.concatenate(parts, axis=-1)


def gravity_center(boxes_bottom: jnp.ndarray) -> jnp.ndarray:
    """Bottom-center-z 9-dim boxes -> gravity-center-z 9-dim boxes."""
    z = boxes_bottom[..., 2:3] + 0.5 * boxes_bottom[..., 5:6]
    return jnp.concatenate(
        [boxes_bottom[..., :2], z, boxes_bottom[..., 3:]], axis=-1
    )


def bottom_center(boxes_gravity: jnp.ndarray) -> jnp.ndarray:
    """Gravity-center-z boxes -> bottom-center-z boxes (decode path)."""
    z = boxes_gravity[..., 2:3] - 0.5 * boxes_gravity[..., 5:6]
    return jnp.concatenate(
        [boxes_gravity[..., :2], z, boxes_gravity[..., 3:]], axis=-1
    )


def corners_3d(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 9 or 7] gravity-centered boxes -> [..., 8, 3] corner points.

    Corner order follows the (±w/2, ±l/2, ±h/2) convention rotated by yaw
    around z. Used by the evaluator and visualisation, not by the model.
    """
    cx, cy, cz = boxes[..., 0], boxes[..., 1], boxes[..., 2]
    w, l, h = boxes[..., 3], boxes[..., 4], boxes[..., 5]
    yaw = boxes[..., 6]
    # unit corners (x: w axis, y: l axis, z: h axis)
    ux = jnp.array([0.5, 0.5, 0.5, 0.5, -0.5, -0.5, -0.5, -0.5])
    uy = jnp.array([0.5, 0.5, -0.5, -0.5, 0.5, 0.5, -0.5, -0.5])
    uz = jnp.array([0.5, -0.5, 0.5, -0.5, 0.5, -0.5, 0.5, -0.5])
    px = ux * w[..., None]
    py = uy * l[..., None]
    pz = uz * h[..., None]
    c, s = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]
    rx = c * px - s * py
    ry = s * px + c * py
    return jnp.stack(
        [rx + cx[..., None], ry + cy[..., None], pz + cz[..., None]], axis=-1
    )
