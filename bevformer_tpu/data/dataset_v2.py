"""V2 temporal dataset: frames-offset queue + mono (DD3D) targets.

Mirrors `datasets/nuscenes_dataset_v2.py:16-302`:
  * queue by explicit frame offsets (e.g. (-1, 0)); all frames share one set
    of augmentation parameters (`:90-104`);
  * adjacent frames' lidar2img are composed with the inverse ego motion so
    they map *current*-frame lidar coordinates (`union2one`, `:109-142`);
  * per-camera mono annotations for DD3D supervision (camera-frame box:
    allocentric-ish quaternion, projected center, depth, size), static-shape
    padded (`:207-230` + `dd3d/datasets/nuscenes.py`).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from bevformer_tpu.configs import BEVFormerConfig
from bevformer_tpu.core.geometry import quat_to_rot
from bevformer_tpu.data import pipeline_v2
from bevformer_tpu.data.dataset import CAM_ORDER, NuScenesTemporalDataset
from bevformer_tpu.models.dd3d import MAX_NUM_ATTRIBUTES


def yaw_to_quat_cam(yaw_lidar: np.ndarray, lidar2cam_r: np.ndarray) -> np.ndarray:
    """Camera-frame orientation quaternion of a lidar box with given yaw."""
    c, s = np.cos(yaw_lidar), np.sin(yaw_lidar)
    r_obj_lidar = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    r = lidar2cam_r @ r_obj_lidar
    # matrix -> quaternion (wxyz)
    tr = np.trace(r)
    if tr > 0:
        w = np.sqrt(max(1 + tr, 1e-12)) / 2
        return np.array(
            [
                w,
                (r[2, 1] - r[1, 2]) / (4 * w),
                (r[0, 2] - r[2, 0]) / (4 * w),
                (r[1, 0] - r[0, 1]) / (4 * w),
            ]
        )
    i = int(np.argmax(np.diag(r)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s2 = np.sqrt(max(1 + r[i, i] - r[j, j] - r[k, k], 1e-12)) * 2
    q = np.zeros(4)
    q[0] = (r[k, j] - r[j, k]) / s2
    q[1 + i] = s2 / 4
    q[1 + j] = (r[j, i] + r[i, j]) / s2
    q[1 + k] = (r[k, i] + r[i, k]) / s2
    return q


class NuScenesTemporalDatasetV2(NuScenesTemporalDataset):
    def __init__(self, *args, max_mono_boxes: int = 32, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_mono_boxes = max_mono_boxes
        self.frames = self.cfg.frames

    def _aug_params(self, train: bool) -> Dict:
        d = self.dcfg
        crop = (0, 260, d.raw_size[1], d.raw_size[0] + 260)
        # when raw_size reflects the post-crop size (640x1600), reconstruct
        # the nuScenes crop window
        if d.raw_size == (640, 1600):
            crop = (0, 260, 1600, 900)
        ida = pipeline_v2.sample_crop_resize_flip(
            self.rng,
            resize_ladder=(
                tuple(d.v2_resize_ladder) if train else (640,)
            ),
            crop=crop,
            rand_flip=train and d.v2_rand_flip,
            training=train,
        )
        bda = (
            pipeline_v2.sample_global_rot_scale_flip(self.rng)
            if train and d.v2_use_grst
            else dict(
                rot_angle=0.0,
                scale_ratio=1.0,
                flip_dx=False,
                flip_dy=False,
                bda_mat=np.eye(3),
            )
        )
        return dict(ida=ida, bda=bda)

    def _load_and_aug_frame(self, index: int, aug: Dict, train: bool):
        """Load one frame's images + geometry with shared aug params."""
        import cv2

        info = self.infos[index]
        cams = info["cams"]
        cam_names = [c for c in CAM_ORDER if c in cams] or list(cams)
        imgs, cam2img, lidar2cam = [], [], []
        for cname in cam_names:
            ci = cams[cname]
            path = (
                ci["data_path"]
                if not self.data_root
                else f"{self.data_root}/{ci['data_path']}"
            )
            img = cv2.imread(path)
            if img is None:
                raise FileNotFoundError(path)
            imgs.append(img.astype(np.float32))
            l2c_r = np.linalg.inv(ci["sensor2lidar_rotation"])
            l2c_t = ci["sensor2lidar_translation"] @ l2c_r.T
            rt = np.eye(4)
            rt[:3, :3] = l2c_r
            rt[:3, 3] = -l2c_t
            lidar2cam.append(rt)
            viewpad = np.eye(4)
            intr = np.asarray(ci["cam_intrinsic"])
            viewpad[: intr.shape[0], : intr.shape[1]] = intr
            cam2img.append(viewpad)

        if train and self.dcfg.use_photometric:
            from bevformer_tpu.data.pipeline import photometric_distortion

            imgs = photometric_distortion(imgs, self.rng)

        imgs, cam2img, lidar2img = pipeline_v2.crop_resize_flip(
            imgs, np.stack(cam2img), np.stack(lidar2cam), aug["ida"]
        )

        # normalize + pad
        mean = np.asarray(self.dcfg.mean, np.float32)
        std = np.asarray(self.dcfg.std, np.float32)
        norm = [(im - mean) / std for im in imgs]
        ph, pw = self.dcfg.img_size
        out = np.zeros((len(norm), ph, pw, 3), np.float32)
        for i, im in enumerate(norm):
            out[i, : im.shape[0], : im.shape[1]] = im
        return out, lidar2img.astype(np.float32), np.stack(lidar2cam), cam2img

    def get_train_sample_v2(self, index: int) -> Optional[Dict]:
        cur_info = self.infos[index]
        ann = self._annotations(cur_info)
        if len(ann["gt_boxes"]) == 0:
            return None

        aug = self._aug_params(train=True)
        t = len(self.frames)
        cams = self.dcfg.num_cams
        ph, pw = self.dcfg.img_size
        images = np.zeros((t, cams, ph, pw, 3), np.float32)
        l2i = np.zeros((t, cams, 4, 4), np.float32)
        frame_valid = np.zeros((t,), bool)

        cur_i = list(self.frames).index(0)
        cur_imgs, cur_l2i, cur_l2c, cur_c2i = self._load_and_aug_frame(
            index, aug, train=True
        )
        images[cur_i], l2i[cur_i] = cur_imgs, cur_l2i
        frame_valid[cur_i] = True

        cur = self.infos[index]
        l2e = np.eye(4)
        l2e[:3, :3] = quat_to_rot(np.asarray(cur.get("lidar2ego_rotation", [1, 0, 0, 0])))
        l2e[:3, 3] = np.asarray(cur.get("lidar2ego_translation", [0, 0, 0]))
        e2g_cur = np.eye(4)
        e2g_cur[:3, :3] = quat_to_rot(np.asarray(cur["ego2global_rotation"]))
        e2g_cur[:3, 3] = np.asarray(cur["ego2global_translation"])

        for ti, off in enumerate(self.frames):
            if off == 0:
                continue
            j = index + off
            if j < 0 or j >= len(self.infos):
                continue
            if self.infos[j]["scene_token"] != cur["scene_token"]:
                continue
            imgs_j, l2i_j, _, _ = self._load_and_aug_frame(j, aug, train=True)
            adj = self.infos[j]
            e2g_adj = np.eye(4)
            e2g_adj[:3, :3] = quat_to_rot(np.asarray(adj["ego2global_rotation"]))
            e2g_adj[:3, 3] = np.asarray(adj["ego2global_translation"])
            lidaradj2lidarcurr = (
                np.linalg.inv(l2e) @ np.linalg.inv(e2g_cur) @ e2g_adj @ l2e
            )
            l2i_j = np.stack(
                [m @ np.linalg.inv(lidaradj2lidarcurr) for m in l2i_j]
            )
            images[ti], l2i[ti] = imgs_j, l2i_j.astype(np.float32)
            frame_valid[ti] = True

        # fill invalid history frames with the current frame's data (the
        # reference fills missing BEVs from the nearest neighbor; providing
        # the current frame's inputs yields the same effect deterministically)
        for ti in range(t):
            if not frame_valid[ti]:
                images[ti], l2i[ti] = images[cur_i], l2i[cur_i]

        # GT: GlobalRotScaleTrans(only_gt) applied to boxes (bottom-z 9-dim)
        boxes = ann["gt_boxes"].copy()
        boxes[:, 2] -= 0.5 * boxes[:, 5]  # gravity -> bottom for the aug ops
        boxes = pipeline_v2.global_rot_scale_trans_gt(boxes, aug["bda"])
        boxes[:, 2] += 0.5 * boxes[:, 5]  # back to gravity-center convention
        labels = ann["gt_labels"]
        # re-apply range filter after the BEV aug
        pcr = self.cfg.pc_range
        keep = (
            (boxes[:, 0] >= pcr[0])
            & (boxes[:, 0] <= pcr[3])
            & (boxes[:, 1] >= pcr[1])
            & (boxes[:, 1] <= pcr[4])
        )
        boxes, labels = boxes[keep], labels[keep]
        if len(boxes) == 0:
            return None

        g = self.cfg.max_gt
        gt_boxes = np.zeros((g, 9), np.float32)
        gt_labels = np.zeros((g,), np.int32)
        n = min(len(boxes), g)
        gt_boxes[:n] = boxes[:n]
        gt_labels[:n] = labels[:n]

        mono = self._mono_targets(cur_info, cur_l2c, cur_c2i, aug)

        return dict(
            images=images,
            lidar2img=l2i,
            frame_valid=frame_valid,
            flip=np.bool_(aug["ida"]["flip"]),
            bda_mat=aug["bda"]["bda_mat"][:2, :2].astype(np.float32),
            gt_boxes=gt_boxes,
            gt_labels=gt_labels,
            num_gt=np.int32(n),
            token=cur_info["token"],
            **mono,
        )

    def _mono_targets(self, info, lidar2cam, cam2img, aug) -> Dict:
        """Per-camera DD3D targets from the lidar-frame GT."""
        ann = self._annotations(info)
        boxes = ann["gt_boxes"]  # gravity-z, lidar frame
        labels = ann["gt_labels"]
        cams = self.dcfg.num_cams
        g = self.max_mono_boxes
        rw, rh = aug["ida"]["resize_dims"]

        out = {
            "mono_boxes2d": np.zeros((cams, g, 4), np.float32),
            "mono_classes": np.zeros((cams, g), np.int32),
            "mono_num_gt": np.zeros((cams,), np.int32),
            "mono_img_valid": np.ones((cams,), bool),
            "mono_quat": np.zeros((cams, g, 4), np.float32),
            "mono_ctr": np.zeros((cams, g, 2), np.float32),
            "mono_depth": np.zeros((cams, g), np.float32),
            "mono_size": np.zeros((cams, g, 3), np.float32),
            "mono_attributes": np.full((cams, g), MAX_NUM_ATTRIBUTES, np.int32),
            "mono_speeds": np.zeros((cams, g), np.float32),
            "inv_intrinsics": np.zeros((cams, 3, 3), np.float32),
        }
        for ci in range(min(cams, len(lidar2cam))):
            k = cam2img[ci][:3, :3]
            out["inv_intrinsics"][ci] = np.linalg.inv(k).astype(np.float32)
            m = 0
            for b, lbl in zip(boxes, labels):
                if m >= g:
                    break
                ctr_cam = lidar2cam[ci][:3, :3] @ b[:3] + lidar2cam[ci][:3, 3]
                if ctr_cam[2] < 0.5:
                    continue
                uvw = k @ ctr_cam
                u, v = uvw[0] / uvw[2], uvw[1] / uvw[2]
                if not (0 <= u < rw and 0 <= v < rh):
                    continue
                # crude 2D box from projected 3D extent
                radius = 0.5 * np.linalg.norm(b[3:6]) / ctr_cam[2] * k[0, 0]
                box2d = np.array(
                    [u - radius, v - radius, u + radius, v + radius]
                )
                box2d = np.clip(box2d, 0, [rw, rh, rw, rh])
                if box2d[2] - box2d[0] < 2 or box2d[3] - box2d[1] < 2:
                    continue
                out["mono_boxes2d"][ci, m] = box2d
                out["mono_classes"][ci, m] = lbl
                out["mono_quat"][ci, m] = yaw_to_quat_cam(
                    b[6], lidar2cam[ci][:3, :3]
                )
                out["mono_ctr"][ci, m] = (u, v)
                out["mono_depth"][ci, m] = ctr_cam[2]
                out["mono_size"][ci, m] = b[3:6]
                speed = float(np.linalg.norm(b[7:9]))
                out["mono_speeds"][ci, m] = speed
                out["mono_attributes"][ci, m] = 0 if speed > 0.2 else 1
                m += 1
            out["mono_num_gt"][ci] = m
        return out

    def get_test_sample_v2(self, index: int) -> Dict:
        aug = self._aug_params(train=False)
        t = len(self.frames)
        cams = self.dcfg.num_cams
        ph, pw = self.dcfg.img_size
        images = np.zeros((t, cams, ph, pw, 3), np.float32)
        l2i = np.zeros((t, cams, 4, 4), np.float32)
        frame_valid = np.zeros((t,), bool)
        cur_i = list(self.frames).index(0)
        cur = self.infos[index]
        imgs, l2i_c, _, _ = self._load_and_aug_frame(index, aug, train=False)
        images[cur_i], l2i[cur_i] = imgs, l2i_c
        frame_valid[cur_i] = True

        l2e = np.eye(4)
        l2e[:3, :3] = quat_to_rot(np.asarray(cur.get("lidar2ego_rotation", [1, 0, 0, 0])))
        l2e[:3, 3] = np.asarray(cur.get("lidar2ego_translation", [0, 0, 0]))
        e2g_cur = np.eye(4)
        e2g_cur[:3, :3] = quat_to_rot(np.asarray(cur["ego2global_rotation"]))
        e2g_cur[:3, 3] = np.asarray(cur["ego2global_translation"])
        for ti, off in enumerate(self.frames):
            if off == 0:
                continue
            j = index + off
            if (
                j < 0
                or j >= len(self.infos)
                or self.infos[j]["scene_token"] != cur["scene_token"]
            ):
                continue
            imgs_j, l2i_j, _, _ = self._load_and_aug_frame(j, aug, train=False)
            adj = self.infos[j]
            e2g_adj = np.eye(4)
            e2g_adj[:3, :3] = quat_to_rot(np.asarray(adj["ego2global_rotation"]))
            e2g_adj[:3, 3] = np.asarray(adj["ego2global_translation"])
            rel = np.linalg.inv(l2e) @ np.linalg.inv(e2g_cur) @ e2g_adj @ l2e
            l2i[ti] = np.stack(
                [m @ np.linalg.inv(rel) for m in l2i_j]
            ).astype(np.float32)
            images[ti] = imgs_j
            frame_valid[ti] = True
        for ti in range(t):
            if not frame_valid[ti]:
                images[ti], l2i[ti] = images[cur_i], l2i[cur_i]
        return dict(
            images=images,
            lidar2img=l2i,
            frame_valid=frame_valid,
            flip=np.bool_(False),
            bda_mat=np.eye(2, dtype=np.float32),
            scene_token=cur["scene_token"],
            token=cur["token"],
        )
