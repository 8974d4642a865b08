"""NDS/mAP evaluator sanity: perfect predictions -> ~1.0; garbage -> ~0."""

import numpy as np

from bevformer_tpu.core.evaluation import evaluate_detections
from bevformer_tpu.core.boxes import CLASS_NAMES


def _mk_gt(rng, tokens, per_sample=5):
    gt = {}
    for t in tokens:
        boxes = rng.randn(per_sample, 9).astype(np.float64)
        boxes[:, :2] *= 20
        boxes[:, 2] = rng.uniform(-2, 0, per_sample)
        boxes[:, 3:6] = np.abs(boxes[:, 3:6]) + 1.0
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, per_sample)
        labels = rng.randint(0, 3, per_sample)  # car/truck/cv only
        gt[t] = dict(boxes=boxes, labels=labels)
    return gt


def test_perfect_predictions():
    rng = np.random.RandomState(0)
    tokens = [f"t{i}" for i in range(4)]
    gt = _mk_gt(rng, tokens)
    results = [
        dict(
            token=t,
            boxes_3d=gt[t]["boxes"].copy(),
            scores_3d=np.linspace(0.9, 0.5, len(gt[t]["boxes"])),
            labels_3d=gt[t]["labels"].copy(),
        )
        for t in tokens
    ]
    m = evaluate_detections(results, gt)
    assert m["mean_ap"] > 0.98, m["mean_ap"]
    assert m["tp_errors"]["trans_err"] < 0.01
    assert m["tp_errors"]["scale_err"] < 0.01
    assert m["tp_errors"]["orient_err"] < 0.01
    # attr unknown -> attr_err = 1 -> NDS = (5*mAP + 4)/10
    assert m["nd_score"] > 0.89


def test_garbage_predictions():
    rng = np.random.RandomState(1)
    tokens = [f"t{i}" for i in range(4)]
    gt = _mk_gt(rng, tokens)
    results = [
        dict(
            token=t,
            boxes_3d=rng.randn(10, 9) * 100,  # far away
            scores_3d=rng.rand(10),
            labels_3d=rng.randint(0, 10, 10),
        )
        for t in tokens
    ]
    m = evaluate_detections(results, gt)
    assert m["mean_ap"] < 0.05


def test_half_detected():
    rng = np.random.RandomState(2)
    tokens = [f"t{i}" for i in range(2)]
    gt = _mk_gt(rng, tokens, per_sample=8)
    results = []
    for t in tokens:
        b = gt[t]["boxes"][:4].copy()  # only half of the gts
        results.append(
            dict(
                token=t,
                boxes_3d=b,
                scores_3d=np.full(len(b), 0.9),
                labels_3d=gt[t]["labels"][:4].copy(),
            )
        )
    m = evaluate_detections(results, gt)
    assert 0.15 < m["mean_ap"] < 0.75


def test_jittered_predictions_monotonic():
    """More position noise -> lower mAP, higher ATE."""
    rng = np.random.RandomState(3)
    tokens = [f"t{i}" for i in range(4)]
    gt = _mk_gt(rng, tokens, per_sample=6)
    scores = []
    ates = []
    for noise in (0.1, 1.5):
        results = []
        for t in tokens:
            b = gt[t]["boxes"].copy()
            b[:, :2] += rng.randn(*b[:, :2].shape) * noise
            results.append(
                dict(
                    token=t,
                    boxes_3d=b,
                    scores_3d=np.full(len(b), 0.9),
                    labels_3d=gt[t]["labels"].copy(),
                )
            )
        m = evaluate_detections(results, gt)
        scores.append(m["mean_ap"])
        ates.append(m["tp_errors"]["trans_err"])
    assert scores[0] > scores[1]
    assert ates[0] < ates[1]


def test_ap_matches_devkit_hand_derivation():
    """Hand-derived devkit fixture: 2 GT, one exact hit (score .9), one far
    miss (score .8). Devkit math: rec=[.5,.5], prec=[1,.5]; 101-point
    interp (right=0) -> bins .00-.49 = 1.0, .50 = .5, rest 0; calc_ap =
    mean(clip(prec[11:]-0.1,0))/0.9 = (39*0.9+0.4)/90/0.9 = 0.4382716.
    Guards our evaluator's binning/interpolation against the devkit
    semantics it reimplements (nuscenes devkit algo.py accumulate/calc_ap).
    """
    from bevformer_tpu.core.evaluation import evaluate_detections

    gt = {
        "s0": {
            "boxes": np.array(
                [
                    [0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0],
                    [30.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0],
                ]
            ),
            "labels": np.array([0, 0]),
        }
    }
    results = [
        {
            "token": "s0",
            "boxes_3d": np.array(
                [
                    [0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0],
                    [15.0, 15.0, 0.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0],
                ]
            ),
            "scores_3d": np.array([0.9, 0.8]),
            "labels_3d": np.array([0, 0]),
        }
    ]
    m = evaluate_detections(results, gt, class_names=("car",))
    expected_ap = (39 * 0.9 + 0.4) / 90 / 0.9
    for th, ap in m["label_aps"]["car"].items():
        np.testing.assert_allclose(ap, expected_ap, atol=1e-9, err_msg=str(th))
    assert m["label_tp_errors"]["car"]["trans_err"] == 0.0


def test_overlap_filter_geometry():
    """Boxes in >1 camera frustum survive; single-camera and
    behind-camera boxes are dropped (nuscnes_eval.py:436-505)."""
    from bevformer_tpu.core.evaluation import (
        apply_overlap_filter,
        filter_boxes_by_overlap,
    )

    h, w, f = 400, 600, 300.0
    intr = np.array([[f, 0, w / 2, 0], [0, f, h / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1.0]])
    # two cameras, yawed +-30 deg around z, both looking along +x (lidar)
    def cam(yaw):
        c, s = np.cos(yaw), np.sin(yaw)
        rotz = np.array([[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1.0]])
        extr = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1.0]])
        return intr @ extr @ rotz.T
    l2i = np.stack([cam(np.deg2rad(-20)), cam(np.deg2rad(20))])

    boxes = np.array(
        [
            [10.0, 0.0, -0.5, 1, 1, 1, 0, 0, 0],   # straight ahead: BOTH cams
            [10.0, 8.0, -0.5, 1, 1, 1, 0, 0, 0],   # one side: ONE cam only
            [-10.0, 0.0, -0.5, 1, 1, 1, 0, 0, 0],  # behind both
        ]
    )
    centers = boxes.copy()
    centers[:, 2] += 0.5 * boxes[:, 5]
    keep = filter_boxes_by_overlap(centers[:, :3], l2i, (h, w))
    assert keep.tolist() == [True, False, False]

    results = [
        dict(token="s0", boxes_3d=boxes, scores_3d=np.array([0.9, 0.8, 0.7]),
             labels_3d=np.array([0, 0, 0]))
    ]
    gt = {"s0": {"boxes": boxes[:2], "labels": np.array([0, 0])}}
    fr, fg = apply_overlap_filter(results, gt, {"s0": l2i}, (h, w))
    assert len(fr[0]["boxes_3d"]) == 1 and len(fg["s0"]["boxes"]) == 1


def test_predict_attribute_rule():
    """The mmdet3d `_format_bbox` class/velocity attribute rule, pinned
    value-by-value (reference consumer: `datasets/nuscenes_dataset.py`
    inherited format_results; table `nuscenes_mono_dataset.py:51-62`)."""
    from bevformer_tpu.core.evaluation import predict_attribute

    fast, slow = (1.0, 0.0), (0.05, 0.05)
    assert predict_attribute("car", fast) == "vehicle.moving"
    assert predict_attribute("truck", fast) == "vehicle.moving"
    assert predict_attribute("trailer", fast) == "vehicle.moving"
    assert predict_attribute("bus", fast) == "vehicle.moving"
    assert predict_attribute("construction_vehicle", fast) == "vehicle.moving"
    assert predict_attribute("bicycle", fast) == "cycle.with_rider"
    assert predict_attribute("motorcycle", fast) == "cycle.with_rider"
    assert predict_attribute("pedestrian", fast) == "pedestrian.moving"
    assert predict_attribute("car", slow) == "vehicle.parked"
    assert predict_attribute("truck", slow) == "vehicle.parked"
    assert predict_attribute("bus", slow) == "vehicle.stopped"
    assert predict_attribute("pedestrian", slow) == "pedestrian.standing"
    assert predict_attribute("bicycle", slow) == "cycle.without_rider"
    assert predict_attribute("barrier", fast) == ""
    assert predict_attribute("traffic_cone", slow) == ""
    # threshold is STRICTLY greater than 0.2 m/s
    assert predict_attribute("car", (0.2, 0.0)) == "vehicle.parked"
    assert predict_attribute("car", (0.21, 0.0)) == "vehicle.moving"


def test_maae_scored_with_gt_attrs():
    """With GT attributes present, velocity-consistent predictions score
    mAAE ~ 0 (attr_err from matching), and NDS rises accordingly; GT ''
    attrs are excluded (devkit NaN cummean)."""
    from bevformer_tpu.core.evaluation import predict_attribute

    rng = np.random.RandomState(2)
    tokens = [f"t{i}" for i in range(4)]
    gt = _mk_gt(rng, tokens)
    for t in tokens:
        g = gt[t]
        g["boxes"][:, 7:9] = rng.randn(len(g["boxes"]), 2)  # velocities
        g["attrs"] = np.array(
            [
                predict_attribute(CLASS_NAMES[l], b[7:9])
                for b, l in zip(g["boxes"], g["labels"])
            ],
            dtype=object,
        )
    results = [
        dict(
            token=t,
            boxes_3d=gt[t]["boxes"].copy(),
            scores_3d=np.linspace(0.9, 0.5, len(gt[t]["boxes"])),
            labels_3d=gt[t]["labels"].copy(),
        )
        for t in tokens
    ]
    m = evaluate_detections(results, gt)
    assert m["tp_errors"]["attr_err"] < 0.01, m["tp_errors"]
    assert m["nd_score"] > 0.98, m["nd_score"]

    # zero the predicted velocities: moving GT boxes now mismatch
    # (vehicle.moving vs vehicle.parked) and mAAE must rise
    results_bad = [
        dict(r, boxes_3d=np.concatenate(
            [r["boxes_3d"][:, :7], np.zeros_like(r["boxes_3d"][:, 7:9])], 1
        ))
        for r in results
    ]
    m2 = evaluate_detections(results_bad, gt)
    assert m2["tp_errors"]["attr_err"] > 0.2, m2["tp_errors"]


def test_format_submission_schema_and_frames():
    """Submission writer: identity lidar2ego/ego2global -> translation is
    the gravity center; a pure-yaw ego rotation rotates centers, velocity
    and box yaw consistently; every box carries attribute_name."""
    from bevformer_tpu.core.evaluation import format_submission
    from bevformer_tpu.core.geometry import quat_yaw

    box = np.zeros((1, 9))
    box[0, :3] = [10.0, 5.0, -1.0]
    box[0, 3:6] = [2.0, 4.0, 1.5]
    box[0, 6] = 0.3
    box[0, 7:9] = [3.0, 0.0]
    res = [dict(token="tok", boxes_3d=box, scores_3d=[0.9], labels_3d=[0])]
    ident = dict(
        lidar2ego_rotation=[1, 0, 0, 0], lidar2ego_translation=[0, 0, 0],
        ego2global_rotation=[1, 0, 0, 0], ego2global_translation=[0, 0, 0],
    )
    sub = format_submission(res, {"tok": ident})
    assert set(sub) == {"meta", "results"}
    rec = sub["results"]["tok"][0]
    assert rec["detection_name"] == "car"
    assert rec["attribute_name"] == "vehicle.moving"
    np.testing.assert_allclose(
        rec["translation"], [10.0, 5.0, -1.0 + 0.75], atol=1e-9
    )
    np.testing.assert_allclose(rec["velocity"], [3.0, 0.0], atol=1e-12)
    # yaw back-conversion: internal (SECOND) 0.3 -> nusc -0.3 - pi/2
    got_yaw = quat_yaw(np.array(rec["rotation"]))
    want = -0.3 - np.pi / 2
    assert abs(((got_yaw - want + np.pi) % (2 * np.pi)) - np.pi) < 1e-9

    # 90-degree ego yaw: lidar +x becomes global +y
    yaw = np.pi / 2
    rot = dict(
        lidar2ego_rotation=[1, 0, 0, 0], lidar2ego_translation=[0, 0, 0],
        ego2global_rotation=[np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)],
        ego2global_translation=[100.0, 0.0, 0.0],
    )
    sub2 = format_submission(res, {"tok": rot})
    rec2 = sub2["results"]["tok"][0]
    np.testing.assert_allclose(
        rec2["translation"], [100.0 - 5.0, 10.0, -0.25], atol=1e-9
    )
    np.testing.assert_allclose(rec2["velocity"], [0.0, 3.0], atol=1e-9)
    got2 = quat_yaw(np.array(rec2["rotation"]))
    want2 = want + yaw
    assert abs(((got2 - want2 + np.pi) % (2 * np.pi)) - np.pi) < 1e-9
