"""BEVFormerHead: DETR-style 3D detection head.

Mirrors `dense_heads/bevformer_head.py:17-509`: owns the BEV query embedding,
the object query embedding, the learned BEV positional encoding and per-layer
cls/reg branches with iterative box refinement. GroupDETR
(`bevformer_head.py:513-683`) is the `group_detr > 1` case: at eval only the
first group of queries is used.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from bevformer_tpu.configs import BEVFormerConfig
from bevformer_tpu.models.layers import MLP, LearnedPositionalEncoding, inverse_sigmoid
from bevformer_tpu.models.transformer import PerceptionTransformer


def _bias_init_with_prob(prob: float) -> float:
    return -math.log((1.0 - prob) / prob)


class ClsBranch(nn.Module):
    embed_dims: int
    num_classes: int
    num_reg_fcs: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_reg_fcs):
            x = nn.Dense(self.embed_dims, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.LayerNorm(dtype=self.dtype, name=f"ln{i}")(x)
            x = nn.relu(x)
        return nn.Dense(
            self.num_classes,
            dtype=jnp.float32,
            bias_init=nn.initializers.constant(_bias_init_with_prob(0.01)),
            name="out",
        )(x)


class RegBranch(nn.Module):
    embed_dims: int
    code_size: int = 10
    num_reg_fcs: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_reg_fcs):
            x = nn.Dense(self.embed_dims, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.code_size, dtype=jnp.float32, name="out")(x)


class BEVFormerHead(nn.Module):
    cfg: BEVFormerConfig

    def setup(self):
        c = self.cfg
        e = c.embed_dims
        dtype = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        self._cdtype = dtype
        num_query_total = c.num_query * c.group_detr

        self.bev_embedding = self.param(
            "bev_embedding",
            nn.initializers.normal(stddev=1.0),
            (c.bev_h * c.bev_w, e),
        )
        # torch nn.Embedding init is N(0, 1)
        self.query_embedding = self.param(
            "query_embedding",
            nn.initializers.normal(stddev=1.0),
            (num_query_total, e * 2),
        )
        self.positional_encoding = LearnedPositionalEncoding(
            num_feats=e // 2,
            row_num_embed=c.bev_h,
            col_num_embed=c.bev_w,
            dtype=dtype,
            name="positional_encoding",
        )
        if c.version == "v2":
            from bevformer_tpu.models.transformer_v2 import (
                PerceptionTransformerV2Flax,
            )

            self.transformer = PerceptionTransformerV2Flax(
                embed_dims=e,
                num_feature_levels=c.num_feature_levels,
                num_cams=c.data.num_cams,
                encoder_layers=c.encoder_layers,
                decoder_layers=c.decoder_layers,
                num_heads=c.num_heads,
                feedforward_channels=c.feedforward_channels,
                ffn_dropout=c.ffn_dropout,
                num_points_in_pillar=c.num_points_in_pillar,
                pc_range=c.pc_range,
                frames=c.frames,
                num_fusion=c.num_fusion,
                inter_channels=c.inter_channels,
                group_detr=c.group_detr,
                sca_capacity_ratio=c.sca_capacity_ratio,
                fused_msda=c.fused_spec(),
                use_remat=c.use_remat,
                dtype=dtype,
                name="transformer",
            )
        else:
            self.transformer = PerceptionTransformer(
                embed_dims=e,
                num_feature_levels=c.num_feature_levels,
                num_cams=c.data.num_cams,
                encoder_layers=c.encoder_layers,
                decoder_layers=c.decoder_layers,
                num_heads=c.num_heads,
                feedforward_channels=c.feedforward_channels,
                ffn_dropout=c.ffn_dropout,
                num_points_in_pillar=c.num_points_in_pillar,
                pc_range=c.pc_range,
                rotate_prev_bev=c.rotate_prev_bev,
                use_shift=c.use_shift,
                use_can_bus=c.use_can_bus,
                rotate_center=c.rotate_center,
                sca_capacity_ratio=c.sca_capacity_ratio,
                fused_msda=c.fused_spec(),
                use_remat=c.use_remat,
                dtype=dtype,
                name="transformer",
            )
        num_pred = c.decoder_layers
        self.cls_branches = [
            ClsBranch(
                embed_dims=e,
                num_classes=c.num_classes,
                num_reg_fcs=c.num_reg_fcs,
                dtype=dtype,
                name=f"cls_branch{i}",
            )
            for i in range(num_pred)
        ]
        self.reg_branches = [
            RegBranch(
                embed_dims=e,
                code_size=c.code_size,
                num_reg_fcs=c.num_reg_fcs,
                dtype=dtype,
                name=f"reg_branch{i}",
            )
            for i in range(num_pred)
        ]

    def __call__(
        self,
        mlvl_feats: Sequence[jnp.ndarray],
        can_bus: jnp.ndarray,
        lidar2img: jnp.ndarray,
        prev_bev: Optional[jnp.ndarray],
        has_prev: jnp.ndarray,
        *,
        only_bev: bool = False,
        training: bool = False,
        deterministic: bool = True,
        prev_bev_list=None,  # V2: list of per-frame BEVs for fusion
        bda_mat=None,  # V2: BEV-grid unwarp matrix [bs, 2, 2]
    ):
        c = self.cfg
        bs = mlvl_feats[0].shape[0]
        img_shape = c.data.img_size

        bev_pos = self.positional_encoding(bs)

        if only_bev:
            if c.version == "v2":
                return self.transformer.get_bev_features(
                    mlvl_feats,
                    self.bev_embedding,
                    bev_pos,
                    c.bev_h,
                    c.bev_w,
                    lidar2img,
                    img_shape,
                    bda_mat,
                    deterministic=deterministic,
                )
            return self.transformer.get_bev_features(
                mlvl_feats,
                self.bev_embedding,
                bev_pos,
                c.bev_h,
                c.bev_w,
                c.grid_length,
                can_bus,
                lidar2img,
                img_shape,
                prev_bev,
                has_prev,
                deterministic=deterministic,
            )

        object_query = self.query_embedding
        if c.group_detr > 1 and not training:
            # eval uses only the first group (`bevformer_head.py:527-528`)
            object_query = object_query[: c.num_query]

        def reg_branch_fn(lid, states):
            return self.reg_branches[lid](states)

        if c.version == "v2":
            bev_embed, hs, init_reference, inter_references = self.transformer(
                mlvl_feats,
                self.bev_embedding,
                object_query,
                bev_pos,
                c.bev_h,
                c.bev_w,
                lidar2img,
                img_shape,
                prev_bev_list,
                bda_mat,
                reg_branch_fn,
                num_groups_present=c.group_detr if training else 1,
                train_fusion=training,
                deterministic=deterministic,
            )
        else:
            bev_embed, hs, init_reference, inter_references = self.transformer(
                mlvl_feats,
                self.bev_embedding,
                object_query,
                bev_pos,
                c.bev_h,
                c.bev_w,
                c.grid_length,
                can_bus,
                lidar2img,
                img_shape,
                prev_bev,
                has_prev,
                reg_branch_fn,
                deterministic=deterministic,
            )

        # per-layer outputs with reference de-normalization
        # (`bevformer_head.py:175-203`)
        x0, y0, z0, x1, y1, z1 = c.pc_range
        outputs_classes = []
        outputs_coords = []
        for lvl in range(hs.shape[0]):
            reference = init_reference if lvl == 0 else inter_references[lvl - 1]
            reference = inverse_sigmoid(reference)
            out_cls = self.cls_branches[lvl](hs[lvl]).astype(jnp.float32)
            tmp = self.reg_branches[lvl](hs[lvl]).astype(jnp.float32)
            xy = jax.nn.sigmoid(tmp[..., 0:2] + reference[..., 0:2])
            z = jax.nn.sigmoid(tmp[..., 4:5] + reference[..., 2:3])
            cx = xy[..., 0:1] * (x1 - x0) + x0
            cy = xy[..., 1:2] * (y1 - y0) + y0
            cz = z * (z1 - z0) + z0
            coord = jnp.concatenate(
                [cx, cy, tmp[..., 2:4], cz, tmp[..., 5:]], axis=-1
            )
            outputs_classes.append(out_cls)
            outputs_coords.append(coord)

        return {
            "bev_embed": bev_embed,
            "all_cls_scores": jnp.stack(outputs_classes),
            "all_bbox_preds": jnp.stack(outputs_coords),
        }
