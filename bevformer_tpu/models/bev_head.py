"""BEVHead + FreeAnchor3DHead: the anchor-based alternative detection head.

Mirrors `bevformer/dense_heads/bev_head.py:28-131`: an encoder-only BEV
feature map (PerceptionTransformerBEVEncoder path) feeds a single-level
anchor head with the FreeAnchor learning-to-match loss (mmdet3d
`FreeAnchor3DHead` semantics):

  * anchors: one (w, l, h) size per class x 2 rotations (0, pi/2) at every
    BEV cell, z fixed per range config;
  * predictions: 1x1 convs for cls [A*C], box deltas [A*9]
    (DeltaXYZWLHRBBoxCoder with velocity), direction [A*2];
  * positive loss: per GT, a bag of the top-k anchors by BEV IoU; bag
    likelihood = sum(softmax-weighted cls*loc probs); loc prob =
    exp(-beta * smoothL1(decoded deltas vs target deltas));
  * negative loss: focal-weighted background likelihood masked by the
    per-anchor object probability P(A|B).

Static shapes: GT padded to max_gt, bags padded with zero weight.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from bevformer_tpu.configs import BEVFormerConfig

# nuScenes anchor sizes per class (w, l, h) — mmdet3d nuScenes free-anchor
# config ordering matches CLASS_NAMES
ANCHOR_SIZES = (
    (1.95017717, 4.60718145, 1.72270761),  # car
    (2.4560939, 6.73778078, 2.73004906),  # truck
    (2.87427237, 6.38281911, 3.19125332),  # construction_vehicle
    (2.94046906, 10.5, 3.47030982),  # bus
    (2.87427237, 12.01320693, 3.8070603),  # trailer
    (2.53279, 0.60058911, 0.98297065),  # barrier
    (0.76279481, 2.09973778, 1.44403034),  # motorcycle
    (0.66344886, 0.7256437, 1.75748069),  # bicycle
    (0.66344886, 0.7256437, 1.75748069),  # pedestrian
    (0.39694519, 0.40359262, 1.06232151),  # traffic_cone
)
ROTATIONS = (0.0, 1.5707963)


def generate_anchors(bev_h: int, bev_w: int, pc_range) -> jnp.ndarray:
    """[bev_h*bev_w*A, 9] anchors (x, y, z, w, l, h, yaw, vx, vy)."""
    x0, y0, z0, x1, y1, z1 = pc_range
    xs = x0 + (jnp.arange(bev_w) + 0.5) * (x1 - x0) / bev_w
    ys = y0 + (jnp.arange(bev_h) + 0.5) * (y1 - y0) / bev_h
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    cells = jnp.stack([xx.reshape(-1), yy.reshape(-1)], -1)  # [HW, 2]
    sizes = jnp.array(ANCHOR_SIZES, jnp.float32)  # [C, 3]
    rots = jnp.array(ROTATIONS, jnp.float32)
    c, r = sizes.shape[0], rots.shape[0]
    hw = cells.shape[0]
    anc = jnp.zeros((hw, c, r, 9), jnp.float32)
    anc = anc.at[..., 0].set(cells[:, None, None, 0])
    anc = anc.at[..., 1].set(cells[:, None, None, 1])
    anc = anc.at[..., 2].set(-0.9)  # nuScenes anchor z
    anc = anc.at[..., 3:6].set(sizes[None, :, None, :])
    anc = anc.at[..., 6].set(rots[None, None, :])
    return anc.reshape(hw * c * r, 9)


def decode_deltas(anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """DeltaXYZWLHRBBoxCoder.decode (mmdet3d): diagonal-normalized deltas."""
    xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
    wa, la, ha = anchors[..., 3], anchors[..., 4], anchors[..., 5]
    ra = anchors[..., 6]
    diag = jnp.sqrt(wa**2 + la**2)
    x = deltas[..., 0] * diag + xa
    y = deltas[..., 1] * diag + ya
    z = deltas[..., 2] * ha + za + ha / 2.0
    w = jnp.exp(deltas[..., 3]) * wa
    l = jnp.exp(deltas[..., 4]) * la
    h = jnp.exp(deltas[..., 5]) * ha
    r = deltas[..., 6] + ra
    z = z - h / 2.0
    out = [x, y, z, w, l, h, r]
    if deltas.shape[-1] > 7:
        out += [deltas[..., 7] + anchors[..., 7], deltas[..., 8] + anchors[..., 8]]
    return jnp.stack(out, -1)


def encode_deltas(anchors: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """DeltaXYZWLHRBBoxCoder.encode (bottom-z boxes)."""
    xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
    wa, la, ha = anchors[..., 3], anchors[..., 4], anchors[..., 5]
    ra = anchors[..., 6]
    xg, yg, zg = boxes[..., 0], boxes[..., 1], boxes[..., 2]
    wg, lg, hg = (
        jnp.maximum(boxes[..., 3], 1e-3),
        jnp.maximum(boxes[..., 4], 1e-3),
        jnp.maximum(boxes[..., 5], 1e-3),
    )
    rg = boxes[..., 6]
    diag = jnp.sqrt(wa**2 + la**2)
    zg_c = zg + hg / 2.0
    za_c = za + ha / 2.0
    out = [
        (xg - xa) / diag,
        (yg - ya) / diag,
        (zg_c - za_c) / ha,
        jnp.log(wg / wa),
        jnp.log(lg / la),
        jnp.log(hg / ha),
        rg - ra,
    ]
    if boxes.shape[-1] > 7:
        out += [boxes[..., 7] - anchors[..., 7], boxes[..., 8] - anchors[..., 8]]
    return jnp.stack(out, -1)


def bev_iou_aligned_free(anchors: jnp.ndarray, gts: jnp.ndarray) -> jnp.ndarray:
    """Nearest-BEV IoU (mmdet3d `bbox_overlaps_nearest_3d`): axis-aligned
    BEV boxes with (w, l) swapped to the nearest rotation. [A, G]."""

    def to_bev(b):
        # nearest-yaw alignment: if |sin(yaw)| > cos -> swap w/l
        yaw = b[..., 6]
        swap = jnp.abs(jnp.sin(yaw)) > jnp.abs(jnp.cos(yaw))
        w = jnp.where(swap, b[..., 4], b[..., 3])
        l = jnp.where(swap, b[..., 3], b[..., 4])
        return jnp.stack(
            [b[..., 0] - w / 2, b[..., 1] - l / 2, b[..., 0] + w / 2,
             b[..., 1] + l / 2],
            -1,
        )

    a = to_bev(anchors)[:, None]  # [A, 1, 4]
    g = to_bev(gts)[None]  # [1, G, 4]
    ix = jnp.maximum(
        0.0,
        jnp.minimum(a[..., 2], g[..., 2]) - jnp.maximum(a[..., 0], g[..., 0]),
    )
    iy = jnp.maximum(
        0.0,
        jnp.minimum(a[..., 3], g[..., 3]) - jnp.maximum(a[..., 1], g[..., 1]),
    )
    inter = ix * iy
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_g = (g[..., 2] - g[..., 0]) * (g[..., 3] - g[..., 1])
    return inter / jnp.maximum(area_a + area_g - inter, 1e-6)


class BEVHead(nn.Module):
    """Anchor-based head over the BEV map (`bev_head.py:28-108`).

    Used with the encoder-only transformer: call with the BEV feature map
    [bs, bev_h*bev_w, E]."""

    cfg: BEVFormerConfig
    pre_anchor_topk: int = 25
    bbox_thr: float = 0.6
    gamma: float = 2.0
    alpha: float = 0.5
    code_size: int = 9

    @nn.compact
    def __call__(self, bev: jnp.ndarray):
        c = self.cfg
        bs = bev.shape[0]
        num_anchors = len(ANCHOR_SIZES) * len(ROTATIONS)
        x = bev.reshape(bs, c.bev_h, c.bev_w, c.embed_dims)
        cls = nn.Conv(num_anchors * c.num_classes, (1, 1), name="conv_cls")(x)
        reg = nn.Conv(num_anchors * self.code_size, (1, 1), name="conv_reg")(x)
        dir_cls = nn.Conv(num_anchors * 2, (1, 1), name="conv_dir_cls")(x)
        a_total = c.bev_h * c.bev_w * num_anchors
        return {
            "cls": cls.reshape(bs, a_total, c.num_classes),
            "reg": reg.reshape(bs, a_total, self.code_size),
            "dir": dir_cls.reshape(bs, a_total, 2),
        }

    def loss(
        self,
        preds: Dict[str, jnp.ndarray],
        gt_boxes: jnp.ndarray,  # [B, G, 9] bottom-z
        gt_labels: jnp.ndarray,  # [B, G]
        num_gt: jnp.ndarray,  # [B]
    ) -> Dict[str, jnp.ndarray]:
        """FreeAnchor learning-to-match loss (mmdet3d semantics)."""
        c = self.cfg
        anchors = generate_anchors(c.bev_h, c.bev_w, c.pc_range)
        a_total = anchors.shape[0]
        k = self.pre_anchor_topk

        def single(cls_s, reg_s, boxes, labels, ng):
            gvalid = jnp.arange(boxes.shape[0]) < ng
            cls_prob = jax.nn.sigmoid(cls_s.astype(jnp.float32))
            decoded = decode_deltas(anchors, reg_s.astype(jnp.float32))

            iou_ag = bev_iou_aligned_free(anchors, boxes)  # [A, G]
            iou_ag = jnp.where(gvalid[None, :], iou_ag, -1.0)

            # ---- positive bag per gt ----
            topv, topi = jax.lax.top_k(iou_ag.T, k)  # [G, k]
            bag_cls = cls_prob[topi, labels[:, None]]  # [G, k]
            tgt_deltas = encode_deltas(anchors[topi], boxes[:, None, :])
            pred_deltas = reg_s[topi].astype(jnp.float32)
            l1 = jnp.abs(pred_deltas - tgt_deltas)
            beta = 1.0 / 9.0
            sl1 = jnp.where(l1 < beta, 0.5 * l1 * l1 / beta, l1 - 0.5 * beta)
            loc_loss = sl1.sum(-1)  # [G, k]
            bag_loc = jnp.exp(-loc_loss)
            match_prob = jax.nn.softmax(
                jnp.where(topv > -0.5, topv, -1e9) * 100.0, axis=-1
            )  # matched weighting (hard-ish over the bag)
            bag_prob = (match_prob * bag_cls * bag_loc).sum(-1)  # [G]
            pos_loss = -jnp.log(jnp.clip(bag_prob, 1e-12, 1.0))
            pos_loss = (pos_loss * gvalid).sum() / jnp.maximum(
                gvalid.sum().astype(jnp.float32), 1.0
            ) * self.alpha

            # ---- negative: P(A|B) object probability per anchor ----
            t1, t2 = self.bbox_thr, 1.0
            obj_prob_g = jnp.clip((iou_ag - t1) / (t2 - t1), 0.0, 1.0)
            # anchor's P(background miss) per class: max over gts of that cls
            cls_onehot = jax.nn.one_hot(labels, c.num_classes) * gvalid[:, None]
            pa_b = jnp.einsum("ag,gc->ac", obj_prob_g, cls_onehot)
            pa_b = jnp.clip(pa_b, 0.0, 1.0)
            neg_prob = cls_prob * (1.0 - pa_b)
            neg_loss = (
                neg_prob**self.gamma
                * -jnp.log(jnp.clip(1.0 - neg_prob, 1e-12, 1.0))
            ).sum() / jnp.maximum(
                k * jnp.maximum(gvalid.sum().astype(jnp.float32), 1.0), 1.0
            ) * (1.0 - self.alpha)
            return pos_loss, neg_loss

        pos, neg = jax.vmap(single)(
            preds["cls"], preds["reg"], gt_boxes, gt_labels, num_gt
        )
        return {
            "loss_positive_bag": pos.mean(),
            "loss_negative_bag": neg.mean(),
            "total": (pos + neg).mean(),
        }

    def get_bboxes(
        self, preds: Dict[str, jnp.ndarray], max_num: int = 300
    ) -> Dict[str, jnp.ndarray]:
        """Top-k decode (NMS-free variant of the anchor head's test path)."""
        c = self.cfg
        anchors = generate_anchors(c.bev_h, c.bev_w, c.pc_range)

        def single(cls_s, reg_s):
            scores = jax.nn.sigmoid(cls_s.astype(jnp.float32)).reshape(-1)
            sc, idx = jax.lax.top_k(scores, max_num)
            a_idx = idx // c.num_classes
            labels = idx % c.num_classes
            boxes = decode_deltas(anchors[a_idx], reg_s[a_idx].astype(jnp.float32))
            return {"bboxes": boxes, "scores": sc, "labels": labels}

        return jax.vmap(single)(preds["cls"], preds["reg"])
