"""BEVFormerV2 detector: explicit-frames temporal + perspective supervision.

Mirrors `detectors/bevformerV2.py:18-269`: no CAN-bus/video state; temporal
context via `frames` offsets, each history frame re-encoded with the current
weights under stop_gradient (`:165-184`); features flipped if the image aug
flipped (`:102-104`); optional DD3D mono head trained on per-camera features
(`:120-153, 217-222`).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from bevformer_tpu.configs import BEVFormerConfig
from bevformer_tpu.models.fpn import FPN
from bevformer_tpu.models.grid_mask import grid_mask
from bevformer_tpu.models.head import BEVFormerHead
from bevformer_tpu.kernels.dcn_pallas import resolve_impl as _dcn_resolve
from bevformer_tpu.models.resnet import ResNet


class BEVFormerV2(nn.Module):
    cfg: BEVFormerConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        self._cdtype = dtype
        self.img_backbone = ResNet(
            depth=c.backbone_depth,
            out_indices=c.backbone_out_indices,
            dcn_stages=c.backbone_dcn_stages,
            dcn_impl=_dcn_resolve(c.fused_dcn),
            dcn_clip_y=c.dcn_clip_y,
            dcn_audit=c.fused_audit,
            style=c.backbone_style,
            norm=c.backbone_norm,
            use_remat=c.use_remat,
            frozen_stages=c.optim.frozen_stages,
            dtype=dtype,
            name="img_backbone",
        )
        # neck produces num_mono_levels outputs; BEV path uses the first
        # num_feature_levels (`bevformerV2.py:177-178, 211-212`)
        self.img_neck = FPN(
            in_channels=c.neck_in_channels,
            out_channels=c.embed_dims,
            num_outs=max(c.num_mono_levels, c.num_feature_levels),
            dtype=dtype,
            name="img_neck",
        )
        self.pts_bbox_head = BEVFormerHead(cfg=c, name="pts_bbox_head")
        if c.num_mono_levels > 0:
            from bevformer_tpu.models.dd3d import NuscenesDD3D

            self.fcos3d_bbox_head = NuscenesDD3D(cfg=c, name="fcos3d_bbox_head")
        else:
            self.fcos3d_bbox_head = None

    def extract_feat(
        self,
        images: jnp.ndarray,  # [bs, cams, H, W, 3]
        flip: Optional[jnp.ndarray] = None,  # [bs] bool: aug flipped
        *,
        use_grid_mask: bool = False,
        train: bool = False,
    ) -> Sequence[jnp.ndarray]:
        bs, cams, h, w, _ = images.shape
        imgs = images.reshape(bs * cams, h, w, 3).astype(self._cdtype)
        if use_grid_mask:
            rng = self.make_rng("grid_mask")
            imgs = grid_mask(rng, imgs)
        feats = self.img_backbone(imgs, train)
        feats = self.img_neck(feats)
        out = []
        for f in feats:
            _, fh, fw, e = f.shape
            f = f.reshape(bs, cams, fh, fw, e)
            if flip is not None:
                flipped = f[:, :, :, ::-1, :]
                f = jnp.where(flip[:, None, None, None, None], flipped, f)
            out.append(f)
        return out

    def bev_only(
        self,
        images: jnp.ndarray,
        lidar2img: jnp.ndarray,
        flip: Optional[jnp.ndarray] = None,
        bda_mat: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Encoder-only BEV for a history frame (eval mode: no grid mask /
        dropout, `bevformerV2.py:165-184`)."""
        c = self.cfg
        feats = self.extract_feat(images, flip, use_grid_mask=False, train=False)
        feats = feats[: c.num_feature_levels]
        return self.pts_bbox_head(
            feats,
            None,
            lidar2img,
            None,
            jnp.zeros((images.shape[0],), bool),
            only_bev=True,
            bda_mat=bda_mat,
        )

    def __call__(
        self,
        images: jnp.ndarray,  # [bs, cams, H, W, 3] current frame
        lidar2img: jnp.ndarray,  # [bs, cams, 4, 4]
        prev_bev_list: Optional[List[Optional[jnp.ndarray]]] = None,
        flip: Optional[jnp.ndarray] = None,
        bda_mat: Optional[jnp.ndarray] = None,
        *,
        training: bool = False,
        return_mono_feats: bool = False,
    ):
        c = self.cfg
        feats = self.extract_feat(
            images,
            flip,
            use_grid_mask=c.use_grid_mask and training,
            train=training,
        )
        bev_feats = feats[: c.num_feature_levels]
        out = self.pts_bbox_head(
            bev_feats,
            None,
            lidar2img,
            None,
            jnp.zeros((images.shape[0],), bool),
            training=training,
            deterministic=not training,
            prev_bev_list=prev_bev_list,
            bda_mat=bda_mat,
        )
        if return_mono_feats:
            mono = feats[: c.num_mono_levels] if c.num_mono_levels else None
            return out, mono
        return out

    def mono_losses(
        self,
        mono_feats: Sequence[jnp.ndarray],  # per level [bs, cams, h, w, e]
        inv_intrinsics: jnp.ndarray,  # [bs, cams, 3, 3]
        mono_targets: Dict[str, jnp.ndarray],  # per-camera padded GT
        *,
        training: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """DD3D perspective losses over all camera images
        (`bevformerV2.py:120-153`; per-image selection via `img_valid`)."""
        assert self.fcos3d_bbox_head is not None
        bs, cams = mono_feats[0].shape[:2]
        flat = [
            f.reshape((bs * cams,) + f.shape[2:]) for f in mono_feats
        ]
        inv_k = inv_intrinsics.reshape(bs * cams, 3, 3)
        losses = self.fcos3d_bbox_head(flat, inv_k, mono_targets, train=training)
        c = self.cfg
        return {f"{k}_mono": v * c.mono_loss_weight for k, v in losses.items()}
