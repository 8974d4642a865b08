"""NMS-free box decoding (static-shape TPU version).

Mirrors `core/bbox/coders/nms_free_coder.py:10-122`: flat top-k over
(num_query x num_classes) sigmoid scores, gather + denormalize boxes,
post-center-range filtering. Instead of dynamically dropping boxes, a
validity mask is returned (host side slices with it when materializing
results), keeping everything jittable.

The adaptive score-threshold decay loop (`nms_free_coder.py:65-73`) only
runs when `score_threshold` is set; no shipped v1 config sets it, but it is
reproduced for parity (as a fixed-point iteration in log-space it reduces
to: threshold decays by 0.9 until any box passes or it drops below 0.01).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from bevformer_tpu.core.boxes import denormalize_bbox


def decode_single(
    cls_scores: jnp.ndarray,  # [Q, C] logits (last decoder layer)
    bbox_preds: jnp.ndarray,  # [Q, 10]
    *,
    max_num: int = 300,
    num_classes: int = 10,
    post_center_range: Sequence[float] = (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0),
    score_threshold: Optional[float] = None,
) -> Dict[str, jnp.ndarray]:
    scores_all = jax.nn.sigmoid(cls_scores.astype(jnp.float32)).reshape(-1)
    # toy configs can have fewer than max_num (Q*C) candidates
    scores, idx = jax.lax.top_k(scores_all, min(max_num, scores_all.shape[0]))
    labels = idx % num_classes
    bbox_idx = idx // num_classes
    boxes_code = bbox_preds[bbox_idx]
    boxes = denormalize_bbox(boxes_code)  # [max_num, 9] gravity-center z

    pcr = jnp.asarray(post_center_range, jnp.float32)
    mask = jnp.all(boxes[:, :3] >= pcr[:3], axis=1) & jnp.all(
        boxes[:, :3] <= pcr[3:], axis=1
    )

    if score_threshold is not None:
        # decay threshold by 0.9 until something passes or it hits 0.01
        def cond(t):
            return (jnp.sum(scores > t) == 0) & (t * 0.9 >= 0.01)

        def body(t):
            return t * 0.9

        thr = jax.lax.while_loop(cond, body, jnp.float32(score_threshold))
        thresh_mask = jnp.where(
            jnp.sum(scores > thr) == 0, scores > -1.0, scores > thr
        )
        mask = mask & thresh_mask

    return {"bboxes": boxes, "scores": scores, "labels": labels, "valid": mask}


def decode_batch(preds: Dict[str, jnp.ndarray], **kw) -> Dict[str, jnp.ndarray]:
    """Decode the last decoder layer for the whole batch."""
    cls_scores = preds["all_cls_scores"][-1]
    bbox_preds = preds["all_bbox_preds"][-1]
    return jax.vmap(lambda c, b: decode_single(c, b, **kw))(
        cls_scores, bbox_preds
    )
