"""V2 data augmentations (host numpy/PIL).

Mirrors `datasets/pipelines/augmentation.py`:
  * `crop_resize_flip` — fixed crop (0, 260, 1600, 900), random resize from a
    discrete height ladder, random horizontal flip (flip is NOT folded into
    the ida matrix: the network flips features instead, `bevformerV2.py:
    102-104`); updates cam2img by the 3x3 ida matrix (`:162-177`).
  * `global_rot_scale_trans_gt` — only_gt mode: rotates/scales/flips the GT
    boxes and emits the inverse bda matrix for the in-network BEV unwarp
    (`:234-303`).

All aug params are returned so history frames can reuse them
(`:179-201` caches them in `aug_param`).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def sample_crop_resize_flip(
    rng: np.random.RandomState,
    resize_ladder: Sequence[int] = (512, 544, 576, 608, 640, 672, 704, 736, 768),
    crop: Tuple[int, int, int, int] = (0, 260, 1600, 900),
    rand_flip: bool = True,
    training: bool = True,
) -> Dict:
    resized_h = (
        resize_ladder[rng.randint(len(resize_ladder))]
        if training
        else resize_ladder[0]
    )
    resize = resized_h / (crop[3] - crop[1])
    resized_w = int(resize * (crop[2] - crop[0]))
    flip = bool(training and rand_flip and rng.randint(2))
    return dict(
        resize=resize,
        resize_dims=(resized_w, int(resized_h)),
        crop=crop,
        flip=flip,
    )


def crop_resize_flip(
    imgs: Sequence[np.ndarray],  # [cams] HWC float32 (BGR)
    cam2img: np.ndarray,  # [cams, 4, 4] (viewpad intrinsics)
    lidar2cam: np.ndarray,  # [cams, 4, 4]
    params: Dict,
):
    from PIL import Image

    resize = params["resize"]
    rw, rh = params["resize_dims"]
    crop = params["crop"]
    flip = params["flip"]

    ida = np.eye(3)
    ida[0, 0] = ida[1, 1] = resize
    ida[:2, 2] = -np.asarray(crop[:2], np.float64) * resize

    out_imgs = []
    cam2img = np.array(cam2img, np.float64).copy()
    for i, im in enumerate(imgs):
        pil = Image.fromarray(np.uint8(np.clip(im, 0, 255)))
        pil = pil.crop(crop).resize((rw, rh))
        if flip:
            pil = pil.transpose(method=Image.FLIP_LEFT_RIGHT)
        out_imgs.append(np.asarray(pil).astype(np.float32))
        cam2img[i][:3, :3] = ida @ cam2img[i][:3, :3]

    lidar2img = np.stack(
        [cam2img[i] @ np.asarray(lidar2cam[i]) for i in range(len(imgs))]
    )
    return out_imgs, cam2img, lidar2img


def transform_box2d(box_xyxy: np.ndarray, params: Dict) -> np.ndarray:
    """2D mono box through crop+resize (flip intentionally ignored,
    `augmentation.py:142-160`)."""
    resize = params["resize"]
    crop = params["crop"]
    b = np.asarray(box_xyxy, np.float64).copy()
    b[[0, 2]] = (b[[0, 2]] - crop[0]) * resize
    b[[1, 3]] = (b[[1, 3]] - crop[1]) * resize
    rw, rh = params["resize_dims"]
    b = np.clip(b, 0, [rw, rh, rw, rh])
    return b


def sample_global_rot_scale_flip(
    rng: np.random.RandomState,
    rot_range=(-22.5, 22.5),
    scale_ratio_range=(0.95, 1.05),
    flip_dx_ratio=0.5,
    flip_dy_ratio=0.5,
) -> Dict:
    rot_angle = rng.uniform(*rot_range) / 180.0 * np.pi
    scale_ratio = rng.uniform(*scale_ratio_range)
    flip_dx = rng.uniform() < flip_dx_ratio
    flip_dy = rng.uniform() < flip_dy_ratio

    c, s = np.cos(rot_angle), np.sin(rot_angle)
    rot_mat = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    scale_mat = np.eye(3) * scale_ratio
    flip_mat = np.eye(3)
    if flip_dx:
        flip_mat = flip_mat @ np.diag([-1.0, 1.0, 1.0])
    if flip_dy:
        flip_mat = flip_mat @ np.diag([1.0, -1.0, 1.0])
    bda_mat = np.linalg.inv(flip_mat @ scale_mat @ rot_mat)
    return dict(
        rot_angle=rot_angle,
        scale_ratio=scale_ratio,
        flip_dx=flip_dx,
        flip_dy=flip_dy,
        bda_mat=bda_mat,
    )


def global_rot_scale_trans_gt(
    boxes9: np.ndarray,  # [G, 9] bottom-z lidar boxes (x,y,z,w,l,h,yaw,vx,vy)
    params: Dict,
    reverse_angle: bool = True,
) -> np.ndarray:
    """Apply only_gt-mode GlobalRotScaleTrans to GT boxes; mmdet3d
    LiDARInstance3DBoxes rotate/scale/flip semantics."""
    b = np.array(boxes9, np.float64).copy()
    rot = params["rot_angle"] * (-1.0 if reverse_angle else 1.0)
    c, s = np.cos(rot), np.sin(rot)
    # LiDARInstance3DBoxes.rotate: xyz @ rot_mat_T, yaw += angle
    rot_mat_t = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]])
    b[:, :3] = b[:, :3] @ rot_mat_t
    b[:, 6] += rot
    b[:, 7:9] = b[:, 7:9] @ rot_mat_t[:2, :2]

    sr = params["scale_ratio"]
    b[:, :6] *= sr
    b[:, 7:9] *= sr

    if params["flip_dx"]:  # bev_direction='vertical': x -> -x
        b[:, 0] = -b[:, 0]
        b[:, 6] = -b[:, 6] - np.pi
        b[:, 7] = -b[:, 7]
    if params["flip_dy"]:  # bev_direction='horizontal': y -> -y
        b[:, 1] = -b[:, 1]
        b[:, 6] = -b[:, 6]
        b[:, 8] = -b[:, 8]
    return b.astype(np.float32)
