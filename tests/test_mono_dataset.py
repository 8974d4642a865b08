"""CustomNuScenesMonoDataset parity: ann parsing, attr rule, global lift,
rotated BEV NMS, submission formatting."""

import numpy as np
import pytest

from bevformer_tpu.core.geometry import quat_to_rot
from bevformer_tpu.data.mono_dataset import (
    NuScenesMonoDataset,
    format_mono_results,
    get_attr_name,
    mono_boxes_to_global,
    nms_rotated_bev,
    rotated_iou_bev,
    _rot_to_quat,
)


def _quat_z(yaw):
    return [np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)]


def _mini_coco():
    images = []
    for i in range(6):
        images.append(
            dict(
                id=i,
                token="s0",
                width=1600,
                height=900,
                cam2ego_rotation=_quat_z(i * np.pi / 3),
                cam2ego_translation=[1.0, 0.0, 1.5],
                ego2global_rotation=_quat_z(0.3),
                ego2global_translation=[100.0, 50.0, 0.0],
                cam_intrinsic=np.eye(3).tolist(),
            )
        )
    anns = [
        dict(  # valid car
            id=0, image_id=0, category_id=0, attribute_id=6,
            bbox=[100, 100, 50, 80], area=4000,
            bbox_cam3d=[1.0, 0.5, 10.0, 1.9, 1.6, 4.5, 0.4],
            velo_cam3d=[1.0, 2.0], center2d=[125, 140, 10.0],
        ),
        dict(  # degenerate width -> dropped (reference :158)
            id=1, image_id=0, category_id=0, attribute_id=6,
            bbox=[0, 0, 0.5, 40], area=20,
            bbox_cam3d=[0, 0, 5, 1, 1, 1, 0],
            velo_cam3d=[0, 0], center2d=[0, 20, 5.0],
        ),
        dict(  # fully outside the image -> dropped (reference :153-157)
            id=2, image_id=0, category_id=1, attribute_id=6,
            bbox=[1700, 100, 50, 50], area=2500,
            bbox_cam3d=[0, 0, 5, 1, 1, 1, 0],
            velo_cam3d=[0, 0], center2d=[1725, 125, 5.0],
        ),
        dict(  # NaN velocity -> zeroed (reference :176-177)
            id=3, image_id=1, category_id=7, attribute_id=2,
            bbox=[10, 10, 30, 60], area=1800,
            bbox_cam3d=[-1.0, 0.2, 8.0, 0.6, 1.7, 0.6, -0.2],
            velo_cam3d=[float("nan"), 1.0], center2d=[25, 40, 8.0],
        ),
    ]
    cats = [dict(id=0, name="car"), dict(id=1, name="truck"),
            dict(id=7, name="pedestrian")]
    return dict(images=images, annotations=anns, categories=cats)


def test_ann_parsing_filters_and_pads():
    ds = NuScenesMonoDataset(_mini_coco(), max_boxes=8)
    assert len(ds) == 6
    a0 = ds.get_ann_info(0)
    assert a0["valid"].sum() == 1  # two of three filtered
    assert a0["labels"][0] == 0
    np.testing.assert_allclose(a0["bboxes"][0], [100, 100, 150, 180])
    np.testing.assert_allclose(a0["bboxes_cam3d"][0, 7:], [1.0, 2.0])
    assert a0["depths"][0] == 10.0
    a1 = ds.get_ann_info(1)
    assert a1["valid"].sum() == 1
    np.testing.assert_allclose(a1["bboxes_cam3d"][0, 7:], [0.0, 1.0])
    assert a1["attr_labels"][0] == 2


def test_attr_rule_consistency_override():
    # consistent predictions survive
    assert get_attr_name(5, "car") == "vehicle.moving"
    assert get_attr_name(3, "pedestrian") == "pedestrian.standing"
    assert get_attr_name(0, "bicycle") == "cycle.with_rider"
    # inconsistent -> class default (reference :246-274)
    assert get_attr_name(2, "car") == "vehicle.parked"
    assert get_attr_name(6, "pedestrian") == "pedestrian.moving"
    assert get_attr_name(5, "motorcycle") == "cycle.without_rider"
    assert get_attr_name(5, "barrier") == ""
    assert get_attr_name(8, "traffic_cone") == ""


def test_mono_box_global_lift_roundtrip():
    """Center/velocity lift must equal explicit matrix composition, and the
    composed quaternion must reproduce the rotation matrix."""
    info = dict(
        cam2ego_rotation=_quat_z(0.7),
        cam2ego_translation=[1.2, -0.3, 1.6],
        ego2global_rotation=_quat_z(-0.4),
        ego2global_translation=[10.0, 20.0, 0.5],
    )
    det = dict(
        boxes_3d=np.array([[2.0, 0.5, 12.0, 1.9, 1.6, 4.5, 0.4, 1.5, 0.5]])
    )
    g = mono_boxes_to_global(det, info)
    r1 = quat_to_rot(np.array(info["cam2ego_rotation"]))
    r2 = quat_to_rot(np.array(info["ego2global_rotation"]))
    c = r2 @ (r1 @ np.array([2.0, 0.5, 12.0]) + [1.2, -0.3, 1.6]) + [
        10.0, 20.0, 0.5]
    np.testing.assert_allclose(g["center"][0], c, atol=1e-9)
    v = r2 @ r1 @ np.array([1.5, 0.0, 0.5])
    np.testing.assert_allclose(g["vel"][0], v, atol=1e-9)
    np.testing.assert_allclose(g["wlh"][0], [4.5, 1.9, 1.6])
    rq = quat_to_rot(g["quat"][0])
    yaw = np.arctan2(rq[1, 0], rq[0, 0])
    np.testing.assert_allclose(yaw, g["yaw"][0], atol=1e-9)


def test_rot_to_quat_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(20):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        r = quat_to_rot(q)
        q2 = _rot_to_quat(r)
        # q and -q are the same rotation
        np.testing.assert_allclose(
            quat_to_rot(q2), r, atol=1e-10
        )


def test_rotated_iou_and_nms():
    a = np.array([0.0, 0.0, 4.0, 2.0, 0.0])
    # identical box -> IoU 1; shifted far -> 0; rotated 90deg -> 2x2 / 6
    ious = rotated_iou_bev(
        a,
        np.array(
            [
                [0.0, 0.0, 4.0, 2.0, 0.0],
                [10.0, 0.0, 4.0, 2.0, 0.0],
                [0.0, 0.0, 4.0, 2.0, np.pi / 2],
            ]
        ),
    )
    np.testing.assert_allclose(ious, [1.0, 0.0, (2 * 2) / (8 + 8 - 4)],
                               atol=1e-9)
    bev = np.array(
        [
            [0.0, 0.0, 4.0, 2.0, 0.1],
            [0.05, 0.0, 4.0, 2.0, 0.1],  # duplicate of 0, lower score
            [20.0, 0.0, 4.0, 2.0, 0.0],  # far away, kept
            [0.0, 0.0, 4.0, 2.0, 0.1],  # other class, kept
        ]
    )
    scores = np.array([0.9, 0.8, 0.7, 0.6])
    labels = np.array([0, 0, 0, 1])
    keep = nms_rotated_bev(bev, scores, labels, iou_thr=0.5)
    assert set(keep.tolist()) == {0, 2, 3}


def test_format_mono_results_merges_frame():
    coco = _mini_coco()
    images = coco["images"]
    # camera 0 and camera 1 both see the SAME global object (lift camera-0's
    # box into camera 1's frame), plus camera 0 has a distant filtered box
    b0 = np.array([[2.0, 0.5, 12.0, 1.9, 1.6, 4.5, 0.4, 1.0, 0.0]])
    g = mono_boxes_to_global(dict(boxes_3d=b0), images[0])
    # express the same global box in camera-1 coordinates
    r1 = quat_to_rot(np.array(images[1]["cam2ego_rotation"]))
    r2 = quat_to_rot(np.array(images[1]["ego2global_rotation"]))
    t1 = np.array(images[1]["cam2ego_translation"])
    t2 = np.array(images[1]["ego2global_translation"])
    c_cam1 = r1.T @ (r2.T @ (g["center"][0] - t2) - t1)
    rx = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], float)
    rg = quat_to_rot(g["quat"][0])
    rz = rx.T @ r1.T @ r2.T @ rg  # Rz(-yaw_cam1)
    yaw_cam1 = -np.arctan2(rz[1, 0], rz[0, 0])
    b1 = np.concatenate(
        [c_cam1, [1.9, 1.6, 4.5, yaw_cam1], [0.0, 0.0]]
    ).reshape(1, 9)
    # far in camera x -> large ego xy-radius under this rig's z-rotations
    far = np.array([[300.0, 0.5, 10.0, 1.9, 1.6, 4.5, 0.0, 0.0, 0.0]])
    results = [
        dict(
            boxes_3d=np.concatenate([b0, far]),
            scores_3d=[0.9, 0.8],
            labels_3d=[0, 0],
            attrs_3d=[5, 5],
        ),
        dict(boxes_3d=b1, scores_3d=[0.7], labels_3d=[0], attrs_3d=[5]),
    ] + [dict(boxes_3d=np.zeros((0, 9)), scores_3d=[], labels_3d=[])] * 4
    sub = format_mono_results(images, results)
    annos = sub["results"]["s0"]
    # far box distance-filtered; duplicate NMS'd: one box survives
    assert len(annos) == 1
    a = annos[0]
    assert a["detection_name"] == "car"
    assert a["attribute_name"] == "vehicle.moving"
    np.testing.assert_allclose(a["translation"], g["center"][0], atol=1e-6)
    np.testing.assert_allclose(a["size"], [4.5, 1.9, 1.6], atol=1e-6)
    assert a["detection_score"] == pytest.approx(0.9)


def test_cross_camera_nms_plane_equivalence_bound():
    """Round-4 verdict: our cross-camera NMS runs in the global (x, y) BEV
    plane where the reference uses the first camera's (x, z) plane
    (`nuscenes_mono_dataset.py:313-318`). Rotated IoU is invariant under
    rigid plane transforms, so the two differ only via camera pitch/roll.
    Pin it numerically on a realistic rig (pitch 1.0deg, roll 0.6deg —
    generous vs nuScenes' sub-degree mounts): IoU deltas bounded and the
    NMS keep SET identical."""
    import numpy as np
    from bevformer_tpu.data.mono_dataset import (
        nms_rotated_bev,
        rotated_iou_bev,
    )

    rng = np.random.RandomState(7)
    n = 40
    # clustered overlapping boxes in the global frame
    centers = np.repeat(rng.randn(8, 2) * 3.0, 5, axis=0) + rng.randn(n, 2) * 0.6
    z = rng.rand(n) * 0.5
    dims = rng.rand(n, 2) * 2.0 + 1.0  # (dx, dy)
    yaw = rng.rand(n) * 2 * np.pi
    scores = rng.rand(n).astype(np.float64)
    labels = np.zeros(n, np.int64)

    bev_g = np.stack(
        [centers[:, 0], centers[:, 1], dims[:, 0], dims[:, 1], yaw], -1
    )

    # camera with yaw 30deg, pitch 1.0deg, roll 0.6deg; cam frame: x right,
    # y down, z forward -> BEV plane (x_cam, z_cam)
    def rot(axis, a):
        c, s = np.cos(a), np.sin(a)
        if axis == "z":
            return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        if axis == "y":
            return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    # global->cam: base axes swap (x_c=-y_g, y_c=-z_g, z_c=x_g) + yaw +
    # small pitch/roll imperfections
    base = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0.0]])
    r_g2c = rot("x", np.deg2rad(1.0)) @ rot("y", np.deg2rad(0.6)) @ base @ rot(
        "z", np.deg2rad(30.0)
    )
    t = np.array([1.0, -2.0, 1.6])

    c3 = np.concatenate([centers, z[:, None]], -1)
    c_cam = (c3 - t) @ r_g2c.T
    # heading direction in the cam (x, z) plane
    h_g = np.stack([np.cos(yaw), np.sin(yaw), np.zeros(n)], -1)
    h_c = h_g @ r_g2c.T
    yaw_c = np.arctan2(h_c[:, 2], h_c[:, 0])
    bev_c = np.stack(
        [c_cam[:, 0], c_cam[:, 2], dims[:, 0], dims[:, 1], yaw_c], -1
    )

    # pairwise IoU bound
    dmax = 0.0
    for i in range(n):
        ious_g = rotated_iou_bev(bev_g[i], bev_g)
        ious_c = rotated_iou_bev(bev_c[i], bev_c)
        dmax = max(dmax, float(np.abs(ious_g - ious_c).max()))
    assert dmax < 0.02, dmax

    kg = set(nms_rotated_bev(bev_g, scores, labels).tolist())
    kc = set(nms_rotated_bev(bev_c, scores, labels).tolist())
    assert kg == kc, (sorted(kg), sorted(kc))
