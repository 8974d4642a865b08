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
