"""Geometry for BEV perception (pure jnp, static shapes, fp32).

Covers the reference's reference-point generation and camera projection
(`/root/reference/projects/mmdet3d_plugin/bevformer/modules/encoder.py:46-149`),
the ego-motion BEV shift (`modules/transformer.py:122-141`), and the
prev-BEV rotation (`modules/transformer.py:143-156`, torchvision `rotate`
tensor path with nearest interpolation), plus quaternion helpers that replace
pyquaternion in the data layer.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Reference points (encoder.py:46-85)
# ---------------------------------------------------------------------------

def reference_points_3d(
    bev_h: int, bev_w: int, z_size: float, num_points_in_pillar: int,
    bs: int = 1, dtype=jnp.float32,
) -> jnp.ndarray:
    """3D pillar reference points for spatial cross-attention.

    Returns [bs, D, bev_h*bev_w, 3] with (x, y, z) each normalized to [0, 1],
    matching `encoder.py:61-71` (pillar z sampled at (0.5 .. Z-0.5)/Z, grid
    x/y at pixel centers / extent).
    """
    d = num_points_in_pillar
    zs = jnp.linspace(0.5, z_size - 0.5, d, dtype=dtype) / z_size
    xs = (jnp.arange(bev_w, dtype=dtype) + 0.5) / bev_w
    ys = (jnp.arange(bev_h, dtype=dtype) + 0.5) / bev_h
    # broadcast to [D, H, W]
    zz = zs[:, None, None] * jnp.ones((d, bev_h, bev_w), dtype)
    xx = jnp.broadcast_to(xs[None, None, :], (d, bev_h, bev_w))
    yy = jnp.broadcast_to(ys[None, :, None], (d, bev_h, bev_w))
    ref = jnp.stack([xx, yy, zz], axis=-1)  # [D, H, W, 3]
    ref = ref.reshape(d, bev_h * bev_w, 3)
    return jnp.broadcast_to(ref[None], (bs, d, bev_h * bev_w, 3))


def reference_points_2d(
    bev_h: int, bev_w: int, bs: int = 1, dtype=jnp.float32
) -> jnp.ndarray:
    """2D BEV-plane reference points for temporal self-attention.

    Returns [bs, bev_h*bev_w, 1, 2] with (x, y) in [0, 1]
    (`encoder.py:74-85`; the singleton axis is num_levels).
    """
    ys = (jnp.arange(bev_h, dtype=dtype) + 0.5) / bev_h
    xs = (jnp.arange(bev_w, dtype=dtype) + 0.5) / bev_w
    yy = jnp.repeat(ys, bev_w)
    xx = jnp.tile(xs, bev_h)
    ref = jnp.stack([xx, yy], axis=-1)  # [H*W, 2]
    return jnp.broadcast_to(ref[None, :, None, :], (bs, bev_h * bev_w, 1, 2))


# ---------------------------------------------------------------------------
# Camera projection / point sampling (encoder.py:87-149)
# ---------------------------------------------------------------------------

def point_sampling(
    ref_3d: jnp.ndarray,
    pc_range: Sequence[float],
    lidar2img: jnp.ndarray,
    img_shape: Tuple[int, int],
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project normalized 3D pillar points into every camera.

    Args:
      ref_3d: [bs, D, Q, 3] normalized reference points.
      pc_range: (x0, y0, z0, x1, y1, z1) metric point-cloud range.
      lidar2img: [bs, num_cams, 4, 4] projection matrices (fp32).
      img_shape: (H, W) of the (padded) network input image in pixels.

    Returns:
      reference_points_cam: [bs, num_cams, Q, D, 2] in [0, 1] image coords.
      bev_mask: [bs, num_cams, Q, D] bool visibility.

    The reference forces fp32 with TF32 off here (`encoder.py:87-93`); on TPU
    we compute in fp32 (`jnp.float32` matmul has full fp32 accumulation with
    `precision=HIGHEST`).
    """
    ref = ref_3d.astype(jnp.float32)
    x0, y0, z0, x1, y1, z1 = [float(v) for v in pc_range]
    scale = jnp.array([x1 - x0, y1 - y0, z1 - z0], jnp.float32)
    offset = jnp.array([x0, y0, z0], jnp.float32)
    pts = ref * scale + offset  # metric lidar coords
    pts_h = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)

    # [bs, cams, D, Q, 4] = einsum over lidar2img @ pts
    cam_pts = jnp.einsum(
        "bnij,bdqj->bndqi",
        lidar2img.astype(jnp.float32),
        pts_h,
        precision=jax.lax.Precision.HIGHEST,
    )
    z = cam_pts[..., 2:3]
    in_front = z > eps
    xy = cam_pts[..., 0:2] / jnp.maximum(z, eps)
    h_img, w_img = img_shape
    xy = xy / jnp.array([float(w_img), float(h_img)], jnp.float32)

    mask = (
        in_front[..., 0]
        & (xy[..., 1] > 0.0)
        & (xy[..., 1] < 1.0)
        & (xy[..., 0] > 0.0)
        & (xy[..., 0] < 1.0)
    )
    # guard NaNs exactly like torch.nan_to_num on the mask path
    # (encoder.py:137-141): NaN coords always compare False already.
    # [bs, cams, D, Q, ...] -> [bs, cams, Q, D, ...]
    ref_cam = jnp.swapaxes(xy, 2, 3)
    mask = jnp.swapaxes(mask, 2, 3)
    return ref_cam, mask


# ---------------------------------------------------------------------------
# Ego-motion BEV shift (transformer.py:122-141)
# ---------------------------------------------------------------------------

def bev_shift(
    delta_x: jnp.ndarray,
    delta_y: jnp.ndarray,
    ego_angle_rad: jnp.ndarray,
    grid_length: Tuple[float, float],
    bev_h: int,
    bev_w: int,
    use_shift: bool = True,
) -> jnp.ndarray:
    """Normalized (shift_x, shift_y) of the BEV grid between two frames.

    Args are per-sample arrays [bs]. `ego_angle_rad` is the current global
    ego yaw (can_bus[-2], radians). Matches `transformer.py:122-141`
    (which does this math in numpy degrees; identical in radians).
    Returns [bs, 2] (x, y) order.
    """
    grid_length_y, grid_length_x = grid_length
    translation_length = jnp.sqrt(delta_x**2 + delta_y**2)
    translation_angle = jnp.arctan2(delta_y, delta_x)
    bev_angle = ego_angle_rad - translation_angle
    shift_y = translation_length * jnp.cos(bev_angle) / grid_length_y / bev_h
    shift_x = translation_length * jnp.sin(bev_angle) / grid_length_x / bev_w
    s = 1.0 if use_shift else 0.0
    return jnp.stack([shift_x * s, shift_y * s], axis=-1)


# ---------------------------------------------------------------------------
# Prev-BEV rotation (transformer.py:143-156)
# ---------------------------------------------------------------------------

def rotate_image_nearest(
    img_hwc: jnp.ndarray, angle_deg: jnp.ndarray, center_xy: Tuple[float, float]
) -> jnp.ndarray:
    """Rotate [H, W, C] by `angle_deg` CCW about `center_xy` (x, y pixels).

    Reproduces torchvision `F.rotate` on tensors with the default NEAREST
    interpolation and zero fill (the reference rotates prev_bev this way,
    `transformer.py:152`; note the default center=[100,100] is applied even
    to 50x50 tiny BEV grids — we reproduce that faithfully).

    Derivation of the sampling map (torchvision `rotate` passes `-angle`
    into `_get_inverse_affine_matrix`, then `_gen_affine_grid` +
    `grid_sample(align_corners=False, mode='nearest')`):
      src_x = cos(r)*(x_o+0.5-cx) - sin(r)*(y_o+0.5-cy) + cx - 0.5
      src_y = sin(r)*(x_o+0.5-cx) + cos(r)*(y_o+0.5-cy) + cy - 0.5
    with nearest rounding and zeros outside.
    """
    h, w = img_hwc.shape[0], img_hwc.shape[1]
    cx, cy = center_xy
    rot = angle_deg * (math.pi / 180.0)
    cos_r, sin_r = jnp.cos(rot), jnp.sin(rot)

    ys = jnp.arange(h, dtype=jnp.float32) + 0.5 - cy
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5 - cx
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    src_x = cos_r * xx - sin_r * yy + (cx - 0.5)
    src_y = sin_r * xx + cos_r * yy + (cy - 0.5)

    ix = jnp.round(src_x).astype(jnp.int32)
    iy = jnp.round(src_y).astype(jnp.int32)
    valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ixc = jnp.clip(ix, 0, w - 1)
    iyc = jnp.clip(iy, 0, h - 1)
    out = img_hwc[iyc, ixc]
    return jnp.where(valid[..., None], out, jnp.zeros_like(out))


def rotate_prev_bev(
    prev_bev: jnp.ndarray,
    angle_deg: jnp.ndarray,
    bev_h: int,
    bev_w: int,
    center_xy: Tuple[float, float] = (100.0, 100.0),
) -> jnp.ndarray:
    """Rotate per-sample prev BEV maps.

    prev_bev: [bs, bev_h*bev_w, C]; angle_deg: [bs]. Returns same shape.
    """

    def one(bev_flat, ang):
        img = bev_flat.reshape(bev_h, bev_w, -1)
        return rotate_image_nearest(img, ang, center_xy).reshape(
            bev_h * bev_w, -1
        )

    return jax.vmap(one)(prev_bev, angle_deg)


# ---------------------------------------------------------------------------
# Quaternion helpers (replace pyquaternion in the data layer; numpy, host-side)
# ---------------------------------------------------------------------------

def quat_to_rot(q: np.ndarray) -> np.ndarray:
    """Unit quaternion (w, x, y, z) -> 3x3 rotation matrix (numpy)."""
    w, x, y, z = [float(v) for v in q]
    n = math.sqrt(w * w + x * x + y * y + z * z)
    if n > 0:
        w, x, y, z = w / n, x / n, y / n, z / n
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        dtype=np.float64,
    )


def quat_yaw(q: np.ndarray) -> float:
    """Yaw (rotation about +z) of quaternion (w, x, y, z).

    Matches pyquaternion's `yaw_pitch_roll[0]` used by the reference data
    converter: the angle of the rotated x-axis in the xy-plane.
    """
    rot = quat_to_rot(np.asarray(q, dtype=np.float64))
    return float(math.atan2(rot[1, 0], rot[0, 0]))


def transform_matrix(
    translation: np.ndarray, rotation_quat: np.ndarray, inverse: bool = False
) -> np.ndarray:
    """4x4 homogeneous transform from translation + quaternion (numpy).

    Equivalent to nuscenes-devkit `transform_matrix`.
    """
    tm = np.eye(4, dtype=np.float64)
    rot = quat_to_rot(np.asarray(rotation_quat, dtype=np.float64))
    t = np.asarray(translation, dtype=np.float64)
    if inverse:
        tm[:3, :3] = rot.T
        tm[:3, 3] = -rot.T @ t
    else:
        tm[:3, :3] = rot
        tm[:3, 3] = t
    return tm
