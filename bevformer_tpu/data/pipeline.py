"""Image preprocessing pipeline (host numpy; cheap ops only).

Covers the reference pipelines (`datasets/pipelines/transform_3d.py`):
  * NormalizeMultiviewImage (mean/std, optional BGR->RGB)
  * RandomScaleImageMultiViewImage (single fixed scale; also scales
    lidar2img by the scale matrix)
  * PadMultiViewImage (pad to size_divisor with zeros)
  * PhotoMetricDistortionMultiViewImage (train-time color jitter)

Images flow HWC BGR uint8/float32 (cv2 layout, matching the reference's
mmcv-loaded images) and come out [cams, H, W, 3] float32 normalized — ready
for the NHWC TPU model.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from bevformer_tpu.configs import DataConfig


def imresize_bilinear(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """cv2-equivalent bilinear resize (mmcv.imresize uses cv2 INTER_LINEAR)."""
    import cv2

    return cv2.resize(img, (out_w, out_h), interpolation=cv2.INTER_LINEAR)


def photometric_distortion(
    imgs: List[np.ndarray],
    rng: np.random.RandomState,
    brightness_delta: float = 32,
    contrast_range: Tuple[float, float] = (0.5, 1.5),
    saturation_range: Tuple[float, float] = (0.5, 1.5),
    hue_delta: int = 18,
) -> List[np.ndarray]:
    """PhotoMetricDistortionMultiViewImage (`transform_3d.py:98-195`):
    independent draws per camera image, BGR float32 input."""
    import cv2

    out = []
    for img in imgs:
        img = img.astype(np.float32)
        if rng.randint(2):
            img = img + rng.uniform(-brightness_delta, brightness_delta)
        mode = rng.randint(2)
        if mode == 1 and rng.randint(2):
            img = img * rng.uniform(*contrast_range)
        # saturation/hue in HSV
        hsv = cv2.cvtColor(img.astype(np.float32), cv2.COLOR_BGR2HSV)
        if rng.randint(2):
            hsv[..., 1] *= rng.uniform(*saturation_range)
        if rng.randint(2):
            hsv[..., 0] += rng.uniform(-hue_delta, hue_delta)
            hsv[..., 0][hsv[..., 0] > 360] -= 360
            hsv[..., 0][hsv[..., 0] < 0] += 360
        img = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
        if mode == 0 and rng.randint(2):
            img = img * rng.uniform(*contrast_range)
        if rng.randint(2):
            img = img[..., rng.permutation(3)]
        out.append(img)
    return out


def preprocess_images(
    imgs: Sequence[np.ndarray],  # [cams] of HWC BGR float32/uint8
    lidar2img: np.ndarray,  # [cams, 4, 4]
    cfg: DataConfig,
    rng: Optional[np.random.RandomState] = None,
    train: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full per-frame pipeline. Returns ([cams, H, W, 3] normalized,
    scaled lidar2img)."""
    imgs = [np.asarray(im, np.float32) for im in imgs]

    if train and cfg.use_photometric and rng is not None:
        imgs = photometric_distortion(imgs, rng)

    # normalize (before scaling, like the reference pipeline order)
    mean = np.asarray(cfg.mean, np.float32)
    std = np.asarray(cfg.std, np.float32)
    if cfg.to_rgb:
        imgs = [im[..., ::-1] for im in imgs]
    imgs = [(im - mean) / std for im in imgs]

    # fixed single-scale resize + lidar2img update (`transform_3d.py:291-330`)
    if cfg.scale != 1.0:
        rh, rw = cfg.resized_size
        imgs = [imresize_bilinear(im, rw, rh) for im in imgs]
        scale_mat = np.eye(4)
        scale_mat[0, 0] = scale_mat[1, 1] = cfg.scale
        lidar2img = np.asarray([scale_mat @ m for m in lidar2img])

    # pad to divisor
    ph, pw = cfg.img_size
    out = np.zeros((len(imgs), ph, pw, 3), np.float32)
    for i, im in enumerate(imgs):
        out[i, : im.shape[0], : im.shape[1]] = im
    return out, np.asarray(lidar2img, np.float32)
