"""Synthetic mini nuScenes-format dataset.

Generates `nuscenes_infos_temporal_{train,val}.pkl` files (same schema as
`tools/data_converter/nuscenes_converter.py`) plus camera JPEGs, so the full
train/eval pipeline runs end-to-end in environments without the real
dataset (this container has no network egress). Geometry is consistent:
boxes are projected through real pinhole intrinsics/extrinsics, the ego
moves along a smooth trajectory, and CAN-bus records the true pose.
"""

from __future__ import annotations

import os
import pickle
from typing import List

import numpy as np

from bevformer_tpu.core.boxes import CLASS_NAMES


def _quat_about_z(yaw: float) -> np.ndarray:
    return np.array([np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)])


def _camera_rigs(img_w=1600, img_h=900):
    """Six cameras looking out radially, nuScenes-style naming."""
    f = 0.8 * img_w
    intrinsic = np.array(
        [[f, 0, img_w / 2], [0, f, img_h / 2], [0, 0, 1]], np.float64
    )
    names = [
        ("CAM_FRONT", 0.0),
        ("CAM_FRONT_RIGHT", -np.pi / 3),
        ("CAM_FRONT_LEFT", np.pi / 3),
        ("CAM_BACK", np.pi),
        ("CAM_BACK_LEFT", 2 * np.pi / 3),
        ("CAM_BACK_RIGHT", -2 * np.pi / 3),
    ]
    rigs = {}
    for name, yaw in names:
        # sensor2lidar rotation: camera z forward -> lidar direction yaw
        cy, sy = np.cos(yaw), np.sin(yaw)
        lidar_from_heading = np.array(
            [[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]], np.float64
        )
        # camera axes in its own frame: x right, y down, z forward.
        # COLUMNS are the camera axes expressed in lidar coords (heading
        # +x): x_cam (image right) -> -y, y_cam (image down) -> -z,
        # z_cam (forward) -> +x. (A stray transpose here before round 3
        # rolled every camera 90 deg: image-horizontal mapped to world-z,
        # halving the visible BEV wedge and making the synthetic geometry
        # unrepresentative of nuScenes.)
        cam_axes_in_lidar = np.array(
            [[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float64
        )
        rot = lidar_from_heading @ cam_axes_in_lidar
        rigs[name] = dict(
            rotation=rot,
            translation=np.array([1.5 * cy, 1.5 * sy, 1.6]),
            intrinsic=intrinsic,
        )
    return rigs


def generate(
    out_dir: str,
    num_scenes: int = 2,
    frames_per_scene: int = 8,
    num_objects: int = 12,
    img_w: int = 1600,
    img_h: int = 900,
    write_images: bool = True,
    seed: int = 0,
    val_fraction: float = 0.5,
):
    rng = np.random.RandomState(seed)
    os.makedirs(out_dir, exist_ok=True)
    img_dir = os.path.join(out_dir, "samples")
    os.makedirs(img_dir, exist_ok=True)
    rigs = _camera_rigs(img_w, img_h)

    infos: List[dict] = []
    for s in range(num_scenes):
        scene_token = f"scene_{s:04d}"
        # world objects scattered around the scene's ego start position
        obj_xy = rng.uniform(-40, 40, (num_objects, 2)) + np.array(
            [100.0 * s, 0.0]
        )
        obj_z = rng.uniform(-1.5, 0.5, num_objects)
        obj_wlh = np.abs(rng.randn(num_objects, 3)) * 0.8 + np.array(
            [1.9, 4.5, 1.7]
        )
        obj_yaw = rng.uniform(-np.pi, np.pi, num_objects)
        obj_cls = rng.randint(0, len(CLASS_NAMES), num_objects)
        obj_vel = rng.randn(num_objects, 2) * 0.5

        ego_yaw0 = rng.uniform(-np.pi, np.pi)
        speed = rng.uniform(3, 8)
        tokens = [f"{scene_token}_f{t:03d}" for t in range(frames_per_scene)]
        for t in range(frames_per_scene):
            dt = 0.5 * t
            yaw = ego_yaw0 + 0.05 * t
            pos = np.array(
                [
                    100 * s + speed * dt * np.cos(yaw),
                    speed * dt * np.sin(yaw),
                    0.0,
                ]
            )
            # move objects by velocity, express in current ego(lidar) frame
            world_xy = obj_xy + obj_vel * dt
            rel = np.concatenate(
                [world_xy - pos[None, :2], obj_z[:, None]], axis=1
            )
            c, sn = np.cos(-yaw), np.sin(-yaw)
            rot2 = np.array([[c, -sn], [sn, c]])
            rel[:, :2] = rel[:, :2] @ rot2.T
            yaw_rel = obj_yaw - yaw
            vel_rel = obj_vel @ rot2.T

            keep = (np.abs(rel[:, 0]) < 52) & (np.abs(rel[:, 1]) < 52)
            gt_boxes = np.concatenate(
                [
                    rel[keep][:, :2],
                    (rel[keep][:, 2] - 0.5 * obj_wlh[keep][:, 2])[:, None],
                    obj_wlh[keep],
                    yaw_rel[keep][:, None],
                ],
                axis=1,
            )
            gt_names = [CLASS_NAMES[i] for i in obj_cls[keep]]
            gt_velocity = vel_rel[keep]
            # GT attributes consistent with the true velocity, via the same
            # class/velocity rule the submission writer applies to preds —
            # a perfect detector scores mAAE ~ 0 on synthetic data
            from bevformer_tpu.core.evaluation import predict_attribute

            gt_attrs = np.array(
                [
                    predict_attribute(n, v)
                    for n, v in zip(gt_names, gt_velocity)
                ],
                dtype=object,
            )

            cams = {}
            for cname, rig in rigs.items():
                data_path = os.path.join(
                    "samples", f"{tokens[t]}_{cname}.jpg"
                )
                cams[cname] = dict(
                    data_path=data_path,
                    type=cname,
                    cam_intrinsic=rig["intrinsic"],
                    sensor2lidar_rotation=rig["rotation"],
                    sensor2lidar_translation=rig["translation"],
                    timestamp=int((s * 1000 + dt) * 1e6),
                )
                if write_images:
                    _render_image(
                        os.path.join(out_dir, data_path),
                        rel[keep],
                        obj_wlh[keep],
                        rig,
                        img_w,
                        img_h,
                        rng,
                    )

            can_bus = np.zeros(18)
            can_bus[:3] = pos
            can_bus[3:7] = _quat_about_z(yaw)
            can_bus[7:10] = [speed * np.cos(yaw), speed * np.sin(yaw), 0]
            infos.append(
                dict(
                    token=tokens[t],
                    scene_token=scene_token,
                    frame_idx=t,
                    prev="" if t == 0 else tokens[t - 1],
                    next="" if t == frames_per_scene - 1 else tokens[t + 1],
                    lidar_path="",
                    sweeps=[],
                    cams=cams,
                    ego2global_translation=pos.tolist(),
                    ego2global_rotation=_quat_about_z(yaw).tolist(),
                    lidar2ego_translation=[0, 0, 0],
                    lidar2ego_rotation=[1, 0, 0, 0],
                    timestamp=int((s * 1000 + dt) * 1e6),
                    can_bus=can_bus,
                    gt_boxes=gt_boxes.astype(np.float64),
                    gt_names=np.array(gt_names),
                    gt_attrs=gt_attrs,
                    gt_velocity=gt_velocity.astype(np.float64),
                    num_lidar_pts=np.full(len(gt_names), 10, np.int64),
                    num_radar_pts=np.zeros(len(gt_names), np.int64),
                    valid_flag=np.ones(len(gt_names), bool),
                )
            )

    n_train_scenes = max(1, int(num_scenes * (1 - val_fraction)))
    train_infos = [
        i
        for i in infos
        if int(i["scene_token"].split("_")[1]) < n_train_scenes
    ]
    val_infos = [i for i in infos if i not in train_infos]
    meta = {"version": "v1.0-synth"}
    with open(
        os.path.join(out_dir, "nuscenes_infos_temporal_train.pkl"), "wb"
    ) as f:
        pickle.dump({"infos": train_infos, "metadata": meta}, f)
    with open(
        os.path.join(out_dir, "nuscenes_infos_temporal_val.pkl"), "wb"
    ) as f:
        pickle.dump({"infos": val_infos, "metadata": meta}, f)
    return out_dir


def _render_image(path, centers, wlh, rig, img_w, img_h, rng):
    """Cheap render: project box centers, draw filled rectangles."""
    import cv2

    img = np.full((img_h, img_w, 3), 90, np.uint8)
    # noise texture so the backbone sees structure
    noise = (rng.rand(-(-img_h // 8), -(-img_w // 8), 3)
             .repeat(8, 0).repeat(8, 1) * 40).astype(np.uint8)
    img += noise[:img_h, :img_w]
    rot, tr, intr = rig["rotation"], rig["translation"], rig["intrinsic"]
    cam_pts = (centers - tr[None]) @ rot  # lidar -> camera frame
    for p, dims in zip(cam_pts, wlh):
        if p[2] < 1.0:
            continue
        uv = intr @ p
        u, v = int(uv[0] / uv[2]), int(uv[1] / uv[2])
        if not (0 <= u < img_w and 0 <= v < img_h):
            continue
        size = max(4, int(800 * dims[0] / p[2]))
        color = tuple(int(c) for c in rng.randint(60, 255, 3))
        cv2.rectangle(
            img,
            (u - size // 2, v - size // 2),
            (u + size // 2, v + size // 2),
            color,
            -1,
        )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, img)
