"""Audit SCA capacity routing against real projective geometry.

Measures, at base (and tiny) geometry with the synthetic nuScenes-style
camera rig (`data/synth.py::_camera_rigs` — 64 deg HFOV, matching the real
nuScenes f~=1266/1600px rig):

  * per-camera visible-QUERY fraction (any z-anchor visible) — the number
    `sca_capacity_ratio` must dominate (SCA drops contributions silently
    when the visible count exceeds cap; ref semantics
    `spatial_cross_attention.py:136-172` never drop),
  * per-camera visible-PAIR fraction ((query, z-anchor) granularity) —
    the item count a per-anchor-routed kernel would pay.

Run on CPU: JAX_PLATFORMS=cpu python tools/audit_sca_capacity.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from bevformer_tpu.configs import get_config
from bevformer_tpu.core import geometry
from bevformer_tpu.data.synth import _camera_rigs


def lidar2img_stack(img_w, img_h, rigs=None):
    rigs = rigs or _camera_rigs(img_w, img_h)
    mats = []
    for name in ["CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
                 "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT"]:
        r = rigs[name]
        # lidar -> cam: inverse of sensor2lidar
        rot = r["rotation"].T
        t = -rot @ r["translation"]
        l2c = np.eye(4)
        l2c[:3, :3] = rot
        l2c[:3, 3] = t
        viewpad = np.eye(4)
        viewpad[:3, :3] = r["intrinsic"]
        mats.append(viewpad @ l2c)
    return np.stack(mats)


def audit(name, bev_h, bev_w, pc_range, img_hw, num_z=4, rigs=None):
    h_img, w_img = img_hw
    l2i = jnp.asarray(lidar2img_stack(w_img, h_img, rigs)[None], jnp.float32)
    # normalized 3D pillar refs like encoder.get_reference_points
    zs = (jnp.linspace(0.5, num_z - 0.5, num_z) / num_z)
    xs = (jnp.arange(bev_w) + 0.5) / bev_w
    ys = (jnp.arange(bev_h) + 0.5) / bev_h
    gx, gy = jnp.meshgrid(xs, ys)  # [h, w]
    q = bev_h * bev_w
    ref = jnp.stack(
        [jnp.broadcast_to(gx.reshape(-1), (num_z, q)),
         jnp.broadcast_to(gy.reshape(-1), (num_z, q)),
         jnp.broadcast_to(zs[:, None], (num_z, q))], axis=-1
    )[None]  # [1, D, Q, 3]
    _, bev_mask = geometry.point_sampling(ref, pc_range, l2i, img_hw)
    bev_mask = np.asarray(bev_mask[0])  # [cams, q, nz]
    anyq = bev_mask.any(-1)  # [cams, q]
    per_cam_q = anyq.mean(1)
    per_cam_pairs = bev_mask.mean((1, 2))
    pairs_of_visible = bev_mask.sum((1, 2)) / np.maximum(
        (anyq.sum(1) * bev_mask.shape[-1]), 1)
    print(f"== {name} bev {bev_h}x{bev_w} img {img_hw} ==")
    print(f"  visible-query fraction/cam: {np.round(per_cam_q, 4).tolist()}"
          f"  max {per_cam_q.max():.4f}")
    print(f"  visible-pair  fraction/cam: {np.round(per_cam_pairs, 4).tolist()}"
          f"  max {per_cam_pairs.max():.4f}")
    print(f"  pair-visibility of routed queries: "
          f"{np.round(pairs_of_visible, 4).tolist()}")
    print(f"  -> safe query cap_ratio >= {per_cam_q.max():.3f}; "
          f"per-anchor item gain x{(per_cam_q.max() / max(per_cam_pairs.max(), 1e-9)):.2f}")
    return per_cam_q.max(), per_cam_pairs.max()


def real_rigs(img_w=1600, img_h=900):
    """The REAL nuScenes focal lengths: 5 cameras at f~=1266 (70 deg HFOV)
    and CAM_BACK at f~=809 (110 deg) — the widest camera sets the capacity
    floor for real data."""
    rigs = _camera_rigs(img_w, img_h)
    s = img_w / 1600.0
    for cam, f in [("CAM_FRONT", 1266.0), ("CAM_FRONT_RIGHT", 1260.0),
                   ("CAM_FRONT_LEFT", 1272.0), ("CAM_BACK", 809.2),
                   ("CAM_BACK_LEFT", 1256.7), ("CAM_BACK_RIGHT", 1259.5)]:
        intr = rigs[cam]["intrinsic"].copy()  # synth SHARES one array
        intr[0, 0] = f * s
        intr[1, 1] = f * s
        rigs[cam]["intrinsic"] = intr
    return rigs


if __name__ == "__main__":
    base = get_config("bevformer_base")
    audit("base(synth rig)", base.bev_h, base.bev_w, base.pc_range, (928, 1600))
    audit("base(real nuScenes rig)", base.bev_h, base.bev_w,
          base.pc_range, (928, 1600), rigs=real_rigs(1600, 928))
    tiny = get_config("bevformer_tiny")
    audit("tiny(synth rig)", tiny.bev_h, tiny.bev_w, tiny.pc_range, (480, 800))
