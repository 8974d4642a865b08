"""BEVFormer detector: backbone + neck + head as one functional module.

Mirrors `detectors/bevformer.py:21-292` minus the stateful parts: the video
state (prev_bev / scene token / ego deltas) and the temporal history loop
live in `bevformer_tpu.runtime` as explicit functional state, which is the
JAX-native equivalent of `prev_frame_info` (`bevformer.py:59-64`) and
`obtain_history_bev` (`bevformer.py:158-177`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from bevformer_tpu.configs import BEVFormerConfig
from bevformer_tpu.models.fpn import FPN
from bevformer_tpu.models.grid_mask import grid_mask
from bevformer_tpu.models.head import BEVFormerHead
from bevformer_tpu.kernels.dcn_pallas import resolve_impl as _dcn_resolve
from bevformer_tpu.models.resnet import ResNet


class BEVFormer(nn.Module):
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
        self.img_neck = FPN(
            in_channels=c.neck_in_channels,
            out_channels=c.embed_dims,
            num_outs=c.num_feature_levels,
            dtype=dtype,
            name="img_neck",
        )
        self.pts_bbox_head = BEVFormerHead(cfg=c, name="pts_bbox_head")

    def extract_feat(
        self,
        images: jnp.ndarray,  # [bs, cams, H, W, 3] normalized
        *,
        use_grid_mask: bool = False,
        train: bool = False,
    ) -> Sequence[jnp.ndarray]:
        """`detectors/bevformer.py:67-108`: fold cams into batch, backbone,
        neck, unfold."""
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
            out.append(f.reshape(bs, cams, fh, fw, e))
        return out

    def __call__(
        self,
        images: jnp.ndarray,
        can_bus: jnp.ndarray,
        lidar2img: jnp.ndarray,
        prev_bev: Optional[jnp.ndarray],
        has_prev: jnp.ndarray,
        *,
        only_bev: bool = False,
        training: bool = False,
        feats: Optional[Sequence[jnp.ndarray]] = None,
    ):
        """Single-frame forward. Returns head outputs (or BEV if only_bev).

        feats: precomputed `extract_feat` output — lets the training
        history unroll batch the backbone over bs*(T-1) frames at once
        (the reference's `obtain_history_bev`, `bevformer.py:158-177`).
        """
        c = self.cfg
        if feats is None:
            feats = self.extract_feat(
                images, use_grid_mask=c.use_grid_mask and training
            )
        return self.pts_bbox_head(
            feats,
            can_bus,
            lidar2img,
            prev_bev,
            has_prev,
            only_bev=only_bev,
            training=training,
            deterministic=not training,
        )
