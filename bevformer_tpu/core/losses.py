"""Detection losses: sigmoid focal classification + weighted L1 regression.

Mirrors the reference head's loss path (`dense_heads/bevformer_head.py:
325-480`): per-decoder-layer Hungarian matching, focal loss normalized by
the (cross-replica mean) positive count, L1 on the 10-dim code with
code_weights, NaN-guarded. Computed over the *global* batch under jit, which
is numerically identical to the reference's per-GPU loss + `reduce_mean`
normalizer + DDP gradient averaging (see `core/assigner.py`).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from bevformer_tpu.core.assigner import hungarian_match
from bevformer_tpu.core.boxes import normalize_bbox


def sigmoid_focal_loss(
    logits: jnp.ndarray,  # [N, C]
    labels: jnp.ndarray,  # [N] int in [0, C] (C = background)
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Elementwise focal loss, summed over classes per sample ([N])."""
    num_classes = logits.shape[-1]
    target = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    logits = logits.astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    pt = (1.0 - p) * target + p * (1.0 - target)
    focal_weight = (alpha * target + (1.0 - alpha) * (1.0 - target)) * jnp.power(
        pt, gamma
    )
    # stable BCE-with-logits
    bce = jnp.maximum(logits, 0) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return (bce * focal_weight).sum(-1)


def smooth_l1(diff: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """mmdet SmoothL1Loss elementwise (V2 bbox loss, beta=1.0)."""
    ad = jnp.abs(diff)
    return jnp.where(ad < beta, 0.5 * ad * ad / beta, ad - 0.5 * beta)


def single_layer_loss(
    cls_scores: jnp.ndarray,  # [B, Q, C]
    bbox_preds: jnp.ndarray,  # [B, Q, 10]
    gt_boxes: jnp.ndarray,  # [B, G, 9] gravity-center z, padded
    gt_labels: jnp.ndarray,  # [B, G]
    num_gt: jnp.ndarray,  # [B]
    code_weights: jnp.ndarray,  # [10]
    *,
    num_classes: int = 10,
    cls_loss_weight: float = 2.0,
    bbox_loss_weight: float = 0.25,
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
    bbox_loss: str = "l1",
    smooth_l1_beta: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, q, c = cls_scores.shape
    assigned = hungarian_match(
        cls_scores,
        bbox_preds,
        gt_boxes,
        gt_labels,
        num_gt,
        cls_weight=cls_loss_weight,
        bbox_weight=bbox_loss_weight,
        focal_alpha=focal_alpha,
        focal_gamma=focal_gamma,
    )  # [B, Q]
    pos = assigned >= 0
    safe_idx = jnp.maximum(assigned, 0)

    labels = jnp.where(
        pos,
        jnp.take_along_axis(gt_labels, safe_idx, axis=1),
        num_classes,
    )
    # classification: avg_factor = global positive count
    # (`bevformer_head.py:362-373`, bg_cls_weight = 0 for focal)
    num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
    loss_cls = (
        sigmoid_focal_loss(
            cls_scores.reshape(-1, c),
            labels.reshape(-1),
            alpha=focal_alpha,
            gamma=focal_gamma,
        ).sum()
        / num_pos
        * cls_loss_weight
    )

    # regression on normalized targets (`bevformer_head.py:380-389`)
    tgt_boxes = jnp.take_along_axis(
        gt_boxes, safe_idx[..., None], axis=1
    )  # [B, Q, 9]
    tgt_norm = normalize_bbox(tgt_boxes)  # [B, Q, 10]
    isnotnan = jnp.isfinite(tgt_norm).all(-1)
    w = (
        pos[..., None].astype(jnp.float32)
        * isnotnan[..., None].astype(jnp.float32)
        * code_weights[None, None, :]
    )
    tgt_norm = jnp.nan_to_num(tgt_norm, nan=0.0, posinf=0.0, neginf=0.0)
    diff = bbox_preds.astype(jnp.float32) - tgt_norm
    if bbox_loss == "smooth_l1":
        l1 = smooth_l1(diff, smooth_l1_beta) * w
    else:
        l1 = jnp.abs(diff) * w
    loss_bbox = l1.sum() / num_pos * bbox_loss_weight

    return jnp.nan_to_num(loss_cls), jnp.nan_to_num(loss_bbox)


def bevformer_loss(
    preds: Dict[str, jnp.ndarray],
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    num_gt: jnp.ndarray,
    code_weights,
    *,
    num_classes: int = 10,
    cls_loss_weight: float = 2.0,
    bbox_loss_weight: float = 0.25,
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
    group_detr: int = 1,
    num_query: int = 900,
    bbox_loss: str = "l1",
    smooth_l1_beta: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """Loss over all decoder layers; GroupDETR averages per-group matches
    (`bevformer_head.py:659-683`)."""
    all_cls = preds["all_cls_scores"]  # [L, B, Q_total, C]
    all_box = preds["all_bbox_preds"]
    num_layers = all_cls.shape[0]
    code_weights = jnp.asarray(code_weights, jnp.float32)

    losses: Dict[str, jnp.ndarray] = {}
    total = 0.0
    for lid in range(num_layers):
        lc_acc, lb_acc = 0.0, 0.0
        for gi in range(group_detr):
            sl = slice(gi * num_query, (gi + 1) * num_query)
            lc, lb = single_layer_loss(
                all_cls[lid][:, sl],
                all_box[lid][:, sl],
                gt_boxes,
                gt_labels,
                num_gt,
                code_weights,
                num_classes=num_classes,
                cls_loss_weight=cls_loss_weight,
                bbox_loss_weight=bbox_loss_weight,
                focal_alpha=focal_alpha,
                focal_gamma=focal_gamma,
                bbox_loss=bbox_loss,
                smooth_l1_beta=smooth_l1_beta,
            )
            lc_acc = lc_acc + lc / group_detr
            lb_acc = lb_acc + lb / group_detr
        key = "loss" if lid == num_layers - 1 else f"d{lid}.loss"
        losses[f"{key}_cls"] = lc_acc
        losses[f"{key}_bbox"] = lb_acc
        total = total + lc_acc + lb_acc
    losses["total"] = total
    return losses
