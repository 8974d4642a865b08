"""DD3D perspective-supervision head (V2), training-only — jax/flax.

Re-implements the reference's `dd3d/` subsystem (`dd3d/modeling/
nuscenes_dd3d.py:314-451`, `fcos2d.py:31-254`, `fcos3d.py:56-327`,
`prepare_targets.py:11-242`, `disentangled_box3d_loss.py:12-46`) with static
shapes: per-camera GT instances are padded to `max_boxes`, FCOS target
assignment is fully vectorized over (image, location, gt), and positives are
masks rather than index lists. Like the reference, inference is not
implemented (`dd3d/modeling/core.py:149-150` raises NotImplementedError) —
the head exists to supervise the backbone during training.

Faithfully reproduced reference quirks:
  * `DisentangledBox3DLoss` calls `.clamp(max=...)` without assignment
    (`disentangled_box3d_loss.py:34`) — the bound is a no-op, so we do not
    clamp either.
  * The attribute loss multiplies a *scalar* mean cross-entropy by the
    centerness weights and divides by their sum (`nuscenes_dd3d.py:241-242`)
    — algebraically just the unweighted mean CE; implemented as such.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from bevformer_tpu.configs import BEVFormerConfig

INF = 1e8
MAX_NUM_ATTRIBUTES = 3

# nuScenes canonical box sizes (wlh per class), `bevformerv2-r50-t1-24ep.py`
CANON_BOX_SIZES = (
    (2.3524184, 0.5062202, 1.0413622),
    (0.61416006, 1.7016163, 1.3054738),
    (2.9139307, 10.725025, 3.2832346),
    (1.9751819, 4.641267, 1.74352),
    (2.772134, 6.565072, 3.2474296),
    (0.7800532, 2.138673, 1.4437162),
    (0.6667362, 0.7181772, 1.7616143),
    (0.40246472, 0.4027083, 1.0084083),
    (3.0059454, 12.8197, 4.1213827),
    (2.4986045, 6.9310856, 2.8382742),
)
STRIDES = (8, 16, 32, 64, 128)
SIZES_OF_INTEREST = ((-1, 64), (64, 128), (128, 256), (256, 512), (512, INF))
MEAN_DEPTH_PER_LEVEL = (44.921, 20.252, 11.712, 7.166, 8.548)
STD_DEPTH_PER_LEVEL = (24.331, 9.833, 6.223, 4.611, 8.275)

# corner sign pattern (x, y, z rows), `structures/boxes3d.py:10-14`
_CORNERS = jnp.array(
    [
        [1, 1, 1, 1, -1, -1, -1, -1],
        [1, -1, -1, 1, 1, -1, -1, 1],
        [1, 1, -1, -1, 1, 1, -1, -1],
    ],
    jnp.float32,
).T  # [8, 3]


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz -> (..., 3, 3) (`boxes3d.py:17-45`)."""
    r, i, j, k = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.maximum((q * q).sum(-1), 1e-12)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        -1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) wxyz; numerically-stable branch select."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw0 = safe_sqrt(1.0 + tr) / 2
    q0 = jnp.stack(
        [qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)],
        -1,
    )
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2
    q1 = jnp.stack([(m21 - m12) / s1, s1 / 4, (m01 + m10) / s1, (m02 + m20) / s1], -1)
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, s2 / 4, (m12 + m21) / s2], -1)
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, s3 / 4], -1)

    cond0 = tr > 0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None],
        q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)


def unproject_points2d(points2d: jnp.ndarray, inv_k: jnp.ndarray) -> jnp.ndarray:
    """[N, 2] pixel coords + [N, 3, 3] inv intrinsics -> [N, 3] rays."""
    homo = jnp.concatenate([points2d, jnp.ones_like(points2d[..., :1])], -1)
    return jnp.einsum("nij,nj->ni", inv_k, homo)


def allocentric_to_egocentric(quat, proj_ctr, inv_k):
    """`utils/geometry.py:107-137`."""
    r_obj = quat_to_matrix(quat)
    ray = unproject_points2d(proj_ctr, inv_k)
    z = ray / jnp.linalg.norm(ray, axis=1, keepdims=True).clip(1e-12)
    y = jnp.array([[0.0, 1.0, 0.0]]) - z[:, 1:2] * z
    y = y / jnp.linalg.norm(y, axis=1, keepdims=True).clip(1e-12)
    x = jnp.cross(y, z)
    r_l2g = jnp.stack([x, y, z], axis=-1)
    return matrix_to_quat(r_l2g @ r_obj)


def boxes3d_corners(quat, proj_ctr, depth, size_wlh, inv_k) -> jnp.ndarray:
    """[N, 8, 3] camera-frame corners (`boxes3d.py:76-97, 205-209`)."""
    tvec = unproject_points2d(proj_ctr, inv_k) * depth[:, None]
    r = quat_to_matrix(quat / jnp.linalg.norm(quat, axis=1, keepdims=True).clip(1e-12))
    lwh = size_wlh[:, jnp.array([1, 0, 2])]
    corners_obj = 0.5 * lwh[:, None, :] * _CORNERS[None]  # [N, 8, 3]
    return jnp.einsum("nij,nkj->nki", r, corners_obj) + tvec[:, None, :]


def smooth_l1(diff, beta):
    ad = jnp.abs(diff)
    return jnp.where(ad < beta, 0.5 * ad * ad / beta, ad - 0.5 * beta)


def compute_locations(shapes: Sequence[Tuple[int, int]], strides=STRIDES):
    """FCOS feature locations per level: (x, y) = stride/2 + idx*stride."""
    locs = []
    for (h, w), s in zip(shapes, strides):
        xs = jnp.arange(w, dtype=jnp.float32) * s + s // 2
        ys = jnp.arange(h, dtype=jnp.float32) * s + s // 2
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        locs.append(jnp.stack([xx.reshape(-1), yy.reshape(-1)], -1))
    return locs


class ConvTower(nn.Module):
    """Shared 3x3 convs with per-FPN-level BatchNorm (ModuleListDial,
    `fcos2d.py:77-98`)."""

    channels: int
    num_convs: int
    num_levels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool):
        outs = list(feats)
        for ci in range(self.num_convs):
            conv = nn.Conv(
                self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                use_bias=False, dtype=self.dtype, name=f"conv{ci}",
            )
            bns = [
                nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    name=f"bn{ci}_l{li}",
                )
                for li in range(self.num_levels)
            ]
            outs = [nn.relu(bns[li](conv(x))) for li, x in enumerate(outs)]
        return outs


class NuscenesDD3D(nn.Module):
    """FCOS2D + FCOS3D + attribute/speed heads and their training losses."""

    cfg: BEVFormerConfig
    num_cls_convs: int = 4
    num_box_convs: int = 4
    num_box3d_convs: int = 4
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    min_depth: float = 0.1
    max_depth: float = 80.0
    box3d_loss_weight: float = 2.0
    conf3d_loss_weight: float = 1.0
    smooth_l1_beta: float = 0.05
    depth_scale_init_factor: float = 0.3
    proj_ctr_scale_init_factor: float = 1.0
    box2d_scale_init_factor: float = 1.0
    scale_depth_factor: float = 500.0
    pos_radius: float = 1.5
    attr_loss_weight: float = 0.2
    speed_loss_weight: float = 0.2

    @nn.compact
    def __call__(
        self,
        features: Sequence[jnp.ndarray],  # per level [N, h, w, C]
        inv_intrinsics: jnp.ndarray,  # [N, 3, 3]
        targets: Dict[str, jnp.ndarray],
        *,
        train: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        nl = len(features)
        nc = c.num_classes
        ch = c.embed_dims
        n = features[0].shape[0]
        dtype = jnp.float32

        cls_tower = ConvTower(ch, self.num_cls_convs, nl, name="cls_tower")(
            features, train
        )
        box_tower = ConvTower(ch, self.num_box_convs, nl, name="box2d_tower")(
            features, train
        )
        box3d_tower = ConvTower(ch, self.num_box3d_convs, nl, name="box3d_tower")(
            features, train
        )

        def head_conv(feats, out_ch, name, bias_init=0.0):
            conv = nn.Conv(
                out_ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=dtype,
                bias_init=nn.initializers.constant(bias_init), name=name,
            )
            return [conv(x) for x in feats]

        def scales(name, inits):
            return [
                self.param(f"{name}_l{li}", nn.initializers.constant(v), ())
                for li, v in enumerate(inits)
            ]

        # FCOS2D predictors (`fcos2d.py:103-115`); cls bias ~= focal prior
        logits = head_conv(cls_tower, nc, "cls_logits",
                           bias_init=-math.log((1 - 0.01) / 0.01))
        centerness = head_conv(box_tower, 1, "centerness")
        box2d_raw = head_conv(box_tower, 4, "box2d_reg")
        s_box2d = scales(
            "scale_box2d",
            [s * self.box2d_scale_init_factor for s in STRIDES[:nl]],
        )
        box2d_reg = [nn.relu(x * s) for x, s in zip(box2d_raw, s_box2d)]

        # FCOS3D predictors (`fcos3d.py:119-151`), class-specific channels
        quat_p = head_conv(box3d_tower, 4 * nc, "box3d_quat")
        ctr_p = head_conv(box3d_tower, 2 * nc, "box3d_ctr")
        depth_p = head_conv(box3d_tower, 1 * nc, "box3d_depth")
        size_p = head_conv(box3d_tower, 3 * nc, "box3d_size")
        conf_p = head_conv(box3d_tower, 1 * nc, "box3d_conf")
        s_ctr = scales(
            "scale_proj_ctr",
            [s * self.proj_ctr_scale_init_factor for s in STRIDES[:nl]],
        )
        s_size = scales("scale_size", [1.0] * nl)
        s_conf = scales("scale_conf", [1.0] * nl)
        s_depth = scales(
            "scale_depth",
            [s * self.depth_scale_init_factor for s in STD_DEPTH_PER_LEVEL[:nl]],
        )
        o_depth = scales("offset_depth", list(MEAN_DEPTH_PER_LEVEL[:nl]))
        ctr_p = [x * s for x, s in zip(ctr_p, s_ctr)]
        size_p = [x * s for x, s in zip(size_p, s_size)]
        conf_p = [x * s for x, s in zip(conf_p, s_conf)]
        depth_p = [x * s + o for x, s, o in zip(depth_p, s_depth, o_depth)]

        # nuScenes attribute / speed from cls tower (`nuscenes_dd3d.py:344-345`)
        attr_p = head_conv(cls_tower, MAX_NUM_ATTRIBUTES, "attr_logits")
        speed_p = [nn.relu(x) for x in head_conv(cls_tower, 1, "speed")]

        # ------------------------------------------------------------------
        # flatten level-first: [N, sum(hw), ...]
        # ------------------------------------------------------------------
        def flat(xs, d):
            return jnp.concatenate(
                [x.reshape(n, -1, d) for x in xs], axis=1
            ).astype(jnp.float32)

        shapes = [(f.shape[1], f.shape[2]) for f in features]
        locs = compute_locations(shapes)
        num_per_level = [l.shape[0] for l in locs]
        locations = jnp.concatenate(locs, 0)  # [P, 2]
        level_of_loc = jnp.concatenate(
            [jnp.full((m,), li, jnp.int32) for li, m in enumerate(num_per_level)]
        )
        size_range = jnp.array(SIZES_OF_INTEREST, jnp.float32)[level_of_loc]

        logits_f = flat(logits, nc)
        box2d_f = flat(box2d_reg, 4)
        ctrness_f = flat(centerness, 1)[..., 0]
        quat_f = flat(quat_p, 4 * nc).reshape(n, -1, 4, nc)
        ctr_f = flat(ctr_p, 2 * nc).reshape(n, -1, 2, nc)
        depth_f = flat(depth_p, nc)
        size_f = flat(size_p, 3 * nc).reshape(n, -1, 3, nc)
        conf_f = flat(conf_p, nc)
        attr_f = flat(attr_p, MAX_NUM_ATTRIBUTES)
        speed_f = flat(speed_p, 1)[..., 0]

        # ------------------------------------------------------------------
        # FCOS target assignment (`prepare_targets.py:101-219`), vectorized
        # ------------------------------------------------------------------
        t = _assign_targets(
            locations,
            level_of_loc,
            size_range,
            targets,
            nc,
            self.pos_radius,
        )
        pos = t["pos"]  # [N, P] bool
        num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

        # classification focal loss (`fcos2d.py:197-215`)
        onehot = jax.nn.one_hot(t["labels"], nc, dtype=jnp.float32) * (
            t["labels"] < nc
        )[..., None].astype(jnp.float32)
        p_sig = jax.nn.sigmoid(logits_f)
        pt = (1 - p_sig) * onehot + p_sig * (1 - onehot)
        focal_w = (
            self.focal_alpha * onehot + (1 - self.focal_alpha) * (1 - onehot)
        ) * jnp.power(pt, self.focal_gamma)
        bce = (
            jnp.maximum(logits_f, 0)
            - logits_f * onehot
            + jnp.log1p(jnp.exp(-jnp.abs(logits_f)))
        )
        img_valid = targets["img_valid"].astype(jnp.float32)[:, None, None]
        loss_cls = (bce * focal_w * img_valid).sum() / num_pos

        posf = pos.astype(jnp.float32)
        # centerness targets from 2D reg targets (`fcos2d.py:21-28`)
        reg_t = t["box2d_reg_targets"]  # [N, P, 4]
        lr = reg_t[..., jnp.array([0, 2])]
        tb = reg_t[..., jnp.array([1, 3])]
        ctr_t = jnp.sqrt(
            jnp.clip(
                (lr.min(-1) / jnp.maximum(lr.max(-1), 1e-12))
                * (tb.min(-1) / jnp.maximum(tb.max(-1), 1e-12)),
                0.0,
            )
        )
        ctr_t = ctr_t * posf
        loss_denom = jnp.maximum(ctr_t.sum(), 1e-6)

        # 2D giou loss weighted by centerness (`fcos2d.py:242`)
        loss_box2d = (
            _giou_loss(box2d_f, reg_t) * ctr_t
        ).sum() / loss_denom

        # centerness BCE (`fcos2d.py:247-249`)
        ctrn_bce = (
            jnp.maximum(ctrness_f, 0)
            - ctrness_f * ctr_t
            + jnp.log1p(jnp.exp(-jnp.abs(ctrness_f)))
        )
        loss_centerness = (ctrn_bce * posf).sum() / num_pos

        # ------------------------------------------------------------------
        # FCOS3D disentangled corner loss (`fcos3d.py:236-327`)
        # ------------------------------------------------------------------
        labels_safe = jnp.minimum(t["labels"], nc - 1)
        sel = jax.nn.one_hot(labels_safe, nc, dtype=jnp.float32)
        quat_sel = jnp.einsum("npqc,npc->npq", quat_f, sel)
        ctr_sel = jnp.einsum("npqc,npc->npq", ctr_f, sel)
        size_sel = jnp.einsum("npqc,npc->npq", size_f, sel)
        depth_sel = jnp.einsum("npc,npc->np", depth_f, sel)
        conf_sel = jnp.einsum("npc,npc->np", conf_f, sel)

        p_total = locations.shape[0]
        flat_pos = posf.reshape(-1)
        locs_nb = jnp.broadcast_to(locations[None], (n, p_total, 2)).reshape(-1, 2)
        inv_k_nb = jnp.broadcast_to(
            inv_intrinsics[:, None], (n, p_total, 3, 3)
        ).reshape(-1, 3, 3)

        def fl(x):
            return x.reshape((n * p_total,) + x.shape[2:])

        # prediction -> Boxes3D (`fcos3d.py:17-53`)
        quat_pred = fl(quat_sel)
        quat_pred = quat_pred / jnp.linalg.norm(
            quat_pred, axis=1, keepdims=True
        ).clip(1e-7)
        pixel_size = jnp.linalg.norm(
            jnp.stack([inv_k_nb[:, 0, 0], inv_k_nb[:, 1, 1]], -1), axis=-1
        )
        depth_pred = fl(depth_sel) / (pixel_size * self.scale_depth_factor)
        depth_pred = jnp.clip(depth_pred, self.min_depth, self.max_depth)
        ctr_pred = fl(ctr_sel) + locs_nb
        quat_pred = allocentric_to_egocentric(quat_pred, ctr_pred, inv_k_nb)
        canon = jnp.array(CANON_BOX_SIZES, jnp.float32)[fl(labels_safe.reshape(n, -1))]
        size_pred = (jnp.tanh(fl(size_sel)) + 1.0) * canon

        gt_quat = fl(t["box3d_quat"])
        gt_ctr = fl(t["box3d_ctr"])
        gt_depth = fl(t["box3d_depth"])
        gt_size = fl(t["box3d_size"])

        target_corners = boxes3d_corners(gt_quat, gt_ctr, gt_depth, gt_size, inv_k_nb)
        ctr_flat = ctr_t.reshape(-1)

        comp_losses = {}
        l1_err_sum = jnp.zeros_like(flat_pos)
        for key, (pq, pc, pd, ps) in {
            "quat": (quat_pred, gt_ctr, gt_depth, gt_size),
            "proj_ctr": (gt_quat, ctr_pred, gt_depth, gt_size),
            "depth": (gt_quat, gt_ctr, depth_pred, gt_size),
            "size": (gt_quat, gt_ctr, gt_depth, size_pred),
        }.items():
            pred_corners = boxes3d_corners(pq, pc, pd, ps, inv_k_nb)
            l1 = smooth_l1(pred_corners - target_corners, self.smooth_l1_beta)
            per_loc = l1.reshape(-1, 24).mean(-1)
            comp_losses[f"loss_box3d_{key}"] = (
                self.box3d_loss_weight
                * (per_loc * ctr_flat).sum()
                / loss_denom
            )

        ent_pred = boxes3d_corners(quat_pred, ctr_pred, depth_pred, size_pred, inv_k_nb)
        l1_err = jnp.abs(ent_pred - target_corners).reshape(-1, 24).mean(-1)
        conf_target = jnp.exp(-l1_err)
        conf_flat = conf_sel.reshape(-1)
        conf_bce = (
            jnp.maximum(conf_flat, 0)
            - conf_flat * conf_target
            + jnp.log1p(jnp.exp(-jnp.abs(conf_flat)))
        )
        loss_conf3d = (
            self.conf3d_loss_weight * (conf_bce * ctr_flat).sum() / loss_denom
        )

        # ------------------------------------------------------------------
        # attribute / speed losses (`nuscenes_dd3d.py:204-279`)
        # ------------------------------------------------------------------
        attr_t = t["attributes"].reshape(-1)
        attr_valid = flat_pos * (attr_t != MAX_NUM_ATTRIBUTES).astype(jnp.float32)
        attr_safe = jnp.minimum(attr_t, MAX_NUM_ATTRIBUTES - 1)
        attr_ce = -jax.nn.log_softmax(attr_f.reshape(-1, MAX_NUM_ATTRIBUTES))[
            jnp.arange(n * p_total), attr_safe
        ]
        loss_attr = self.attr_loss_weight * (attr_ce * attr_valid).sum() / jnp.maximum(
            attr_valid.sum(), 1e-6
        )

        speed_t = t["speeds"].reshape(-1)
        speed_valid = flat_pos * jnp.isfinite(speed_t).astype(jnp.float32)
        speed_w = ctr_flat * speed_valid
        sp_l1 = smooth_l1(
            speed_f.reshape(-1) - jnp.nan_to_num(speed_t), 0.05
        )
        loss_speed = (
            self.speed_loss_weight
            * (sp_l1 * speed_w).sum()
            / jnp.maximum(speed_w.sum(), 1e-6)
        )

        return {
            "loss_cls": loss_cls,
            "loss_box2d_reg": loss_box2d,
            "loss_centerness": loss_centerness,
            "loss_conf3d": loss_conf3d,
            "loss_attr": loss_attr,
            "loss_speed": loss_speed,
            **comp_losses,
        }


def _giou_loss(pred, target):
    """FCOS (l, t, r, b) giou loss per location (`layers/iou_loss.py`)."""
    pl, pt, pr, pb = pred[..., 0], pred[..., 1], pred[..., 2], pred[..., 3]
    tl, tt, tr, tb = target[..., 0], target[..., 1], target[..., 2], target[..., 3]
    target_area = (tl + tr) * (tt + tb)
    pred_area = (pl + pr) * (pt + pb)
    w_int = jnp.minimum(pl, tl) + jnp.minimum(pr, tr)
    h_int = jnp.minimum(pb, tb) + jnp.minimum(pt, tt)
    g_w = jnp.maximum(pl, tl) + jnp.maximum(pr, tr)
    g_h = jnp.maximum(pb, tb) + jnp.maximum(pt, tt)
    ac = g_w * g_h
    inter = w_int * h_int
    union = target_area + pred_area - inter
    ious = (inter + 1.0) / (union + 1.0)
    gious = ious - (ac - union) / jnp.maximum(ac, 1e-7)
    return 1.0 - gious


def _assign_targets(locations, level_of_loc, size_range, targets, num_classes, radius):
    """Vectorized FCOS assignment (`prepare_targets.py:101-219`).

    targets (all padded to G):
      boxes2d [N, G, 4] xyxy; classes [N, G]; num_gt [N]; img_valid [N]
      box3d_quat [N, G, 4]; box3d_ctr [N, G, 2] (projected center, absolute);
      box3d_depth [N, G]; box3d_size [N, G, 3] (wlh);
      attributes [N, G]; speeds [N, G]
    """
    n, g = targets["classes"].shape
    p = locations.shape[0]
    xs, ys = locations[:, 0], locations[:, 1]
    boxes = targets["boxes2d"].astype(jnp.float32)  # [N, G, 4]

    l = xs[None, :, None] - boxes[:, None, :, 0]
    t_ = ys[None, :, None] - boxes[:, None, :, 1]
    r = boxes[:, None, :, 2] - xs[None, :, None]
    b = boxes[:, None, :, 3] - ys[None, :, None]
    reg = jnp.stack([l, t_, r, b], axis=-1)  # [N, P, G, 4]

    # center sampling (`prepare_targets.py:186-219`)
    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5
    strides = jnp.array(STRIDES, jnp.float32)[level_of_loc] * radius  # [P]
    xmin = jnp.maximum(cx[:, None] - strides[None, :, None], boxes[:, None, :, 0])
    ymin = jnp.maximum(cy[:, None] - strides[None, :, None], boxes[:, None, :, 1])
    xmax = jnp.minimum(cx[:, None] + strides[None, :, None], boxes[:, None, :, 2])
    ymax = jnp.minimum(cy[:, None] + strides[None, :, None], boxes[:, None, :, 3])
    inside = (
        (xs[None, :, None] > xmin)
        & (xs[None, :, None] < xmax)
        & (ys[None, :, None] > ymin)
        & (ys[None, :, None] < ymax)
    )

    max_reg = reg.max(-1)  # [N, P, G]
    cared = (max_reg >= size_range[None, :, 0:1]) & (
        max_reg <= size_range[None, :, 1:2]
    )

    area = (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])
    gt_valid = (jnp.arange(g)[None, :] < targets["num_gt"][:, None]) & targets[
        "img_valid"
    ][:, None]
    loc_area = jnp.where(
        inside & cared & gt_valid[:, None, :], area[:, None, :], INF
    )
    min_area = loc_area.min(-1)
    gt_idx = loc_area.argmin(-1)  # [N, P]
    pos = min_area < INF

    def take(field):
        # per-image gather of the assigned gt's attribute: [N, G, ...][gt_idx]
        return jax.vmap(lambda xx, ii: xx[ii])(
            targets[field].astype(
                jnp.float32
                if targets[field].dtype in (jnp.float32, jnp.float64)
                else targets[field].dtype
            ),
            gt_idx,
        )

    labels = jnp.where(pos, take("classes"), num_classes)
    out = {
        "labels": labels,
        "pos": pos,
        "box2d_reg_targets": jax.vmap(lambda r_, i_: r_[jnp.arange(p), i_])(
            reg, gt_idx
        ),
        "box3d_quat": take("box3d_quat"),
        "box3d_ctr": take("box3d_ctr"),
        "box3d_depth": take("box3d_depth"),
        "box3d_size": take("box3d_size"),
        "attributes": jnp.where(pos, take("attributes"), MAX_NUM_ATTRIBUTES),
        "speeds": take("speeds"),
    }
    return out
