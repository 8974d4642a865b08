"""Real nuScenes infos converter (requires nuscenes-devkit at runtime).

Produces `nuscenes_infos_temporal_{train,val}.pkl` with the same schema as
the reference converter (`tools/data_converter/nuscenes_converter.py:
154-311`): per-sample token/prev/next/scene_token/frame_idx, 18-dim CAN-bus
vector (pos3 + orientation quat4 + accel3 + rotation_rate3 + vel3 + 2 spare),
six camera dicts with intrinsics + sensor2lidar extrinsics, gt boxes in the
SECOND/mmdet3d yaw convention (-yaw - pi/2), velocities in the lidar frame,
and valid_flag.

This module imports nuscenes-devkit lazily so the rest of the framework
works without it (this container cannot install it: zero egress).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List

import numpy as np

from bevformer_tpu.core.geometry import quat_to_rot, quat_yaw

CAM_TYPES = (
    "CAM_FRONT",
    "CAM_FRONT_RIGHT",
    "CAM_FRONT_LEFT",
    "CAM_BACK",
    "CAM_BACK_LEFT",
    "CAM_BACK_RIGHT",
)


def _get_can_bus_info(nusc, nusc_can_bus, sample) -> np.ndarray:
    """18-dim CAN-bus vector (`nuscenes_converter.py:154-176`)."""
    scene_name = nusc.get("scene", sample["scene_token"])["name"]
    timestamp = sample["timestamp"]
    try:
        pose_list = nusc_can_bus.get_messages(scene_name, "pose")
    except Exception:
        return np.zeros(18)
    can_bus = []
    last_pose = pose_list[0]
    for pose in pose_list:
        if pose["utime"] > timestamp:
            break
        last_pose = pose
    last_pose = dict(last_pose)
    last_pose.pop("utime")
    pos = last_pose.pop("pos")
    rotation = last_pose.pop("orientation")
    can_bus.extend(pos)
    can_bus.extend(rotation)
    for key in ("accel", "rotation_rate", "vel"):
        can_bus.extend(last_pose[key])
    can_bus.extend([0.0, 0.0])
    return np.array(can_bus)


def _cam_info(nusc, cam_token, l2e_t, l2e_r_mat, e2g_t, e2g_r_mat) -> Dict:
    """Camera record with sensor2lidar extrinsics (devkit obtain_sensor2top
    semantics)."""
    sd_rec = nusc.get("sample_data", cam_token)
    cs_rec = nusc.get("calibrated_sensor", sd_rec["calibrated_sensor_token"])
    pose_rec = nusc.get("ego_pose", sd_rec["ego_pose_token"])
    data_path = str(nusc.get_sample_data_path(cam_token))
    if os.path.isabs(data_path):
        data_path = os.path.relpath(data_path, nusc.dataroot)

    s2e_r_mat = quat_to_rot(np.array(cs_rec["rotation"]))
    s2e_t = np.array(cs_rec["translation"])
    se2g_r_mat = quat_to_rot(np.array(pose_rec["rotation"]))
    se2g_t = np.array(pose_rec["translation"])

    # sensor->global then global->lidar (reference math, kept in matrix form)
    r = (s2e_r_mat.T @ se2g_r_mat.T) @ (
        np.linalg.inv(e2g_r_mat).T @ np.linalg.inv(l2e_r_mat).T
    )
    t = (s2e_t @ se2g_r_mat.T + se2g_t) @ (
        np.linalg.inv(e2g_r_mat).T @ np.linalg.inv(l2e_r_mat).T
    )
    t -= (
        e2g_t @ (np.linalg.inv(e2g_r_mat).T @ np.linalg.inv(l2e_r_mat).T)
        + l2e_t @ np.linalg.inv(l2e_r_mat).T
    )
    return dict(
        data_path=data_path,
        type=sd_rec["channel"],
        sample_data_token=cam_token,
        sensor2lidar_rotation=r.T,
        sensor2lidar_translation=t,
        cam_intrinsic=np.array(cs_rec["camera_intrinsic"]),
        timestamp=sd_rec["timestamp"],
    )


def create_nuscenes_infos(
    root_path: str,
    canbus_root: str,
    out_dir: str,
    version: str = "v1.0-trainval",
):
    from nuscenes import NuScenes
    from nuscenes.can_bus.can_bus_api import NuScenesCanBus
    from nuscenes.utils import splits

    nusc = NuScenes(version=version, dataroot=root_path, verbose=True)
    nusc_can = NuScenesCanBus(dataroot=canbus_root)

    if version == "v1.0-trainval":
        train_scenes, val_scenes = splits.train, splits.val
    elif version == "v1.0-mini":
        train_scenes, val_scenes = splits.mini_train, splits.mini_val
    elif version == "v1.0-test":
        train_scenes, val_scenes = splits.test, []
    else:
        raise ValueError(version)
    name_by_token = {s["token"]: s["name"] for s in nusc.scene}

    train_infos: List[dict] = []
    val_infos: List[dict] = []
    frame_idx = 0
    for sample in nusc.sample:
        lidar_token = sample["data"]["LIDAR_TOP"]
        sd_rec = nusc.get("sample_data", lidar_token)
        cs_rec = nusc.get("calibrated_sensor", sd_rec["calibrated_sensor_token"])
        pose_rec = nusc.get("ego_pose", sd_rec["ego_pose_token"])
        l2e_r_mat = quat_to_rot(np.array(cs_rec["rotation"]))
        l2e_t = np.array(cs_rec["translation"])
        e2g_r_mat = quat_to_rot(np.array(pose_rec["rotation"]))
        e2g_t = np.array(pose_rec["translation"])

        info = dict(
            token=sample["token"],
            prev=sample["prev"],
            next=sample["next"],
            can_bus=_get_can_bus_info(nusc, nusc_can, sample),
            frame_idx=frame_idx,
            sweeps=[],
            cams={},
            scene_token=sample["scene_token"],
            lidar_path=str(nusc.get_sample_data_path(lidar_token)),
            lidar2ego_translation=cs_rec["translation"],
            lidar2ego_rotation=cs_rec["rotation"],
            ego2global_translation=pose_rec["translation"],
            ego2global_rotation=pose_rec["rotation"],
            timestamp=sample["timestamp"],
        )
        frame_idx = 0 if sample["next"] == "" else frame_idx + 1

        for cam in CAM_TYPES:
            info["cams"][cam] = _cam_info(
                nusc, sample["data"][cam], l2e_t, l2e_r_mat, e2g_t, e2g_r_mat
            )

        if version != "v1.0-test":
            annotations = [
                nusc.get("sample_annotation", t) for t in sample["anns"]
            ]
            boxes = nusc.get_boxes(lidar_token)
            locs, dims, rots, vels, names, valid = [], [], [], [], [], []
            attrs = []
            for ann, box in zip(annotations, boxes):
                # transform box from global to lidar frame
                center = np.array(box.center) - e2g_t
                center = center @ e2g_r_mat  # global -> ego (R^T x)
                center = (center - l2e_t) @ l2e_r_mat
                yaw_global = quat_yaw(
                    np.array(
                        [box.orientation.w, box.orientation.x,
                         box.orientation.y, box.orientation.z]
                    )
                    if hasattr(box.orientation, "w")
                    else np.array(box.orientation.q)
                )
                yaw = (
                    yaw_global
                    - quat_yaw_from_mat(e2g_r_mat)
                    - quat_yaw_from_mat(l2e_r_mat)
                )
                v = nusc.box_velocity(box.token)[:2]
                v = np.nan_to_num(v)
                v = v @ e2g_r_mat[:2, :2] @ l2e_r_mat[:2, :2]
                locs.append(center)
                # devkit wlh -> reference stores (w, l, h)
                dims.append(np.array(box.wlh))
                # SECOND yaw convention (`nuscenes_converter.py:300`)
                rots.append(-yaw - np.pi / 2)
                vels.append(v)
                names.append(_map_name(box.name))
                valid.append(
                    ann["num_lidar_pts"] + ann["num_radar_pts"] > 0
                )
                # GT attribute name ('' if none) — the devkit's eval loads
                # these from the DB (`nuscnes_eval.py` DetectionBox GT);
                # stored in infos so the self-contained evaluator can score
                # mAAE without the devkit
                attrs.append(
                    nusc.get("attribute", ann["attribute_tokens"][0])["name"]
                    if ann.get("attribute_tokens")
                    else ""
                )
            gt = (
                np.concatenate(
                    [
                        np.array(locs),
                        np.array(dims),
                        np.array(rots)[:, None],
                    ],
                    axis=1,
                )
                if locs
                else np.zeros((0, 7))
            )
            info.update(
                gt_boxes=gt,
                gt_names=np.array(names),
                gt_attrs=np.array(attrs, dtype=object),
                gt_velocity=np.array(vels).reshape(-1, 2),
                num_lidar_pts=np.array(
                    [a["num_lidar_pts"] for a in annotations]
                ),
                num_radar_pts=np.array(
                    [a["num_radar_pts"] for a in annotations]
                ),
                valid_flag=np.array(valid, bool),
            )

        scene_name = name_by_token[sample["scene_token"]]
        (train_infos if scene_name in train_scenes else val_infos).append(info)

    os.makedirs(out_dir, exist_ok=True)
    meta = dict(version=version)
    for split, infos in (("train", train_infos), ("val", val_infos)):
        path = os.path.join(
            out_dir, f"nuscenes_infos_temporal_{split}.pkl"
        )
        with open(path, "wb") as f:
            pickle.dump(dict(infos=infos, metadata=meta), f)
        print(f"{path}: {len(infos)} samples")


def quat_yaw_from_mat(rot: np.ndarray) -> float:
    import math

    return math.atan2(rot[1, 0], rot[0, 0])


_NAME_MAP = {
    "movable_object.barrier": "barrier",
    "vehicle.bicycle": "bicycle",
    "vehicle.bus.bendy": "bus",
    "vehicle.bus.rigid": "bus",
    "vehicle.car": "car",
    "vehicle.construction": "construction_vehicle",
    "vehicle.motorcycle": "motorcycle",
    "human.pedestrian.adult": "pedestrian",
    "human.pedestrian.child": "pedestrian",
    "human.pedestrian.construction_worker": "pedestrian",
    "human.pedestrian.police_officer": "pedestrian",
    "movable_object.trafficcone": "traffic_cone",
    "vehicle.trailer": "trailer",
    "vehicle.truck": "truck",
}


def _map_name(raw: str) -> str:
    return _NAME_MAP.get(raw, raw)
