"""Assigner / loss / coder tests, with torch-based oracles where the
reference semantics are non-trivial (sigmoid focal loss)."""

import numpy as np
import jax
import jax.numpy as jnp

from bevformer_tpu.core import assigner, coder, losses
from bevformer_tpu.core.boxes import DEFAULT_CODE_WEIGHTS, normalize_bbox


def _rand_gt(rng, b, g_max, num_gt):
    boxes = rng.randn(b, g_max, 9).astype(np.float32)
    boxes[..., 3:6] = np.abs(boxes[..., 3:6]) + 0.5
    labels = rng.randint(0, 10, (b, g_max)).astype(np.int32)
    return jnp.array(boxes), jnp.array(labels), jnp.array(num_gt, np.int32)


def test_hungarian_matches_scipy_direct():
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(0)
    b, q, g = 2, 40, 8
    cls_pred = jnp.array(rng.randn(b, q, 10), jnp.float32)
    bbox_pred = jnp.array(rng.randn(b, q, 10), jnp.float32)
    gt_boxes, gt_labels, num_gt = _rand_gt(rng, b, g, [5, 0])

    assigned = np.asarray(
        assigner.hungarian_match(cls_pred, bbox_pred, gt_boxes, gt_labels, num_gt)
    )
    # sample 1 has no gts -> all background
    assert (assigned[1] == -1).all()
    # sample 0: exactly num_gt positives, all distinct
    pos = assigned[0][assigned[0] >= 0]
    assert len(pos) == 5 and len(set(pos.tolist())) == 5

    # cross-check optimality against direct scipy on the same cost
    cost = np.asarray(
        assigner.focal_cls_cost(cls_pred[0], gt_labels[0, :5])
        + assigner.bbox3d_l1_cost(
            bbox_pred[0], normalize_bbox(gt_boxes[0, :5])
        )
    )
    rows, cols = linear_sum_assignment(cost)
    expect = np.full(q, -1)
    expect[rows] = cols
    np.testing.assert_array_equal(assigned[0], expect)


def test_focal_loss_matches_torch():
    import torch

    rng = np.random.RandomState(1)
    n, c = 64, 10
    logits = rng.randn(n, c).astype(np.float32)
    labels = rng.randint(0, c + 1, n)  # includes background

    got = np.asarray(
        losses.sigmoid_focal_loss(jnp.array(logits), jnp.array(labels))
    ).sum()

    # torch oracle implementing mmdet's py_sigmoid_focal_loss
    t_logits = torch.from_numpy(logits)
    t_target = torch.nn.functional.one_hot(
        torch.from_numpy(labels).long(), c + 1
    )[:, :c].float()
    p = t_logits.sigmoid()
    pt = (1 - p) * t_target + p * (1 - t_target)
    fw = (0.25 * t_target + 0.75 * (1 - t_target)) * pt.pow(2.0)
    bce = torch.nn.functional.binary_cross_entropy_with_logits(
        t_logits, t_target, reduction="none"
    )
    expect = float((bce * fw).sum())
    assert abs(got - expect) < 1e-3 * max(1.0, abs(expect))


def test_bevformer_loss_runs_and_is_finite():
    rng = np.random.RandomState(2)
    L, b, q = 3, 2, 40
    preds = {
        "all_cls_scores": jnp.array(rng.randn(L, b, q, 10), jnp.float32),
        "all_bbox_preds": jnp.array(rng.randn(L, b, q, 10), jnp.float32),
    }
    gt_boxes, gt_labels, num_gt = _rand_gt(rng, b, 8, [5, 3])
    out = losses.bevformer_loss(
        preds, gt_boxes, gt_labels, num_gt, DEFAULT_CODE_WEIGHTS, num_query=q
    )
    assert set(k for k in out if k.endswith("_cls")) == {
        "loss_cls", "d0.loss_cls", "d1.loss_cls",
    }
    for k, v in out.items():
        assert np.isfinite(float(v)), k
    assert float(out["total"]) > 0


def test_loss_grad_flows():
    rng = np.random.RandomState(3)
    L, b, q = 1, 1, 20
    gt_boxes, gt_labels, num_gt = _rand_gt(rng, b, 4, [3])
    cls0 = jnp.array(rng.randn(L, b, q, 10), jnp.float32)
    box0 = jnp.array(rng.randn(L, b, q, 10), jnp.float32)

    def f(cls, box):
        return losses.bevformer_loss(
            {"all_cls_scores": cls, "all_bbox_preds": box},
            gt_boxes, gt_labels, num_gt, DEFAULT_CODE_WEIGHTS, num_query=q,
        )["total"]

    gc, gb = jax.grad(f, argnums=(0, 1))(cls0, box0)
    assert float(jnp.abs(gc).sum()) > 0
    assert float(jnp.abs(gb).sum()) > 0


def test_decode_topk_and_range_mask():
    rng = np.random.RandomState(4)
    b, q, c = 1, 50, 10
    cls = jnp.array(rng.randn(b, 2, q, c), jnp.float32)  # 2 "layers"
    box = np.zeros((b, 2, q, 10), np.float32)
    box[..., 0] = rng.uniform(-70, 70, (b, 2, q))  # some out of range
    preds = {
        "all_cls_scores": jnp.transpose(cls, (1, 0, 2, 3)),
        "all_bbox_preds": jnp.transpose(jnp.array(box), (1, 0, 2, 3)),
    }
    out = coder.decode_batch(preds, max_num=30)
    assert out["bboxes"].shape == (b, 30, 9)
    assert out["scores"].shape == (b, 30)
    s = np.asarray(out["scores"][0])
    assert (np.diff(s) <= 1e-6).all()  # sorted descending
    # validity mask matches center range
    bx = np.asarray(out["bboxes"][0])
    v = np.asarray(out["valid"][0])
    inside = (np.abs(bx[:, 0]) <= 61.2) & (np.abs(bx[:, 1]) <= 61.2) & (
        np.abs(bx[:, 2]) <= 10.0
    )
    np.testing.assert_array_equal(v, inside)
