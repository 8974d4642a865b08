"""Multi-modality (camera + lidar BEV) encoder fusion layer.

Port of the reference's `MM_BEVFormerLayer`
(`/root/reference/projects/mmdet3d_plugin/bevformer/modules/encoder.py:415-594`):
the standard TSA -> norm -> SCA -> norm -> FFN -> norm BEVFormer layer,
except the camera cross-attention output is blended with a single-level
deformable cross-attention over a lidar BEV map by a LEARNED scalar
(`cross_model_weights`, init 0.5):

    query = w * sca(query, cam_feats) + (1 - w) * msda(query, lidar_bev)

Registered but unused by every shipped BEVFormer config (no lidar branch
in the released models); provided for parity. Note the reference crashes
if `lidar_cross_attn_layer` is None (`new_query2` unbound at
`encoder.py:583`) — here the lidar branch is mandatory, matching the only
configuration the reference code could actually run.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from bevformer_tpu.models.attention import (
    CustomMSDeformableAttention,
    SpatialCrossAttention,
    TemporalSelfAttention,
)
from bevformer_tpu.models.layers import FFN


class MMBEVFormerLayer(nn.Module):
    """operation_order = (self_attn, norm, cross_attn, norm, ffn, norm),
    cross_attn = camera SCA blended with lidar msda."""

    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 512
    ffn_dropout: float = 0.1
    num_cams: int = 6
    num_levels: int = 4
    sca_num_points: int = 8
    tsa_num_points: int = 4
    lidar_num_points: int = 4
    sca_capacity_ratio: float = 0.0
    fused_msda: Any = "off"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [bs, q, e]
        value: jnp.ndarray,  # [bs, cams, k, e] camera features
        lidar_bev: jnp.ndarray,  # [bs, bev_h*bev_w, e] lidar BEV map
        bev_pos: jnp.ndarray,  # [bs, q, e]
        value_queue: jnp.ndarray,  # [bs, 2, q, e] TSA value (prev, cur)
        hybrid_ref_2d: jnp.ndarray,  # [bs, 2, q, 1, 2]
        reference_points_cam: jnp.ndarray,  # [bs, cams, q, D, 2]
        bev_mask: jnp.ndarray,  # [bs, cams, q, D] bool
        spatial_shapes: Tuple[Tuple[int, int], ...],
        bev_h: int,
        bev_w: int,
        *,
        deterministic: bool = True,
        sca_precomputed=None,
    ) -> jnp.ndarray:
        query = TemporalSelfAttention(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            num_points=self.tsa_num_points,
            fused_msda=self.fused_msda,
            dtype=self.dtype,
            name="self_attn",
        )(
            query,
            value_queue,
            bev_pos,
            hybrid_ref_2d,
            bev_h,
            bev_w,
            deterministic=deterministic,
        )
        query = nn.LayerNorm(dtype=self.dtype, name="norm1")(query)

        new_query1 = SpatialCrossAttention(
            embed_dims=self.embed_dims,
            num_cams=self.num_cams,
            num_heads=self.num_heads,
            num_levels=self.num_levels,
            num_points=self.sca_num_points,
            capacity_ratio=self.sca_capacity_ratio,
            fused_msda=self.fused_msda,
            dtype=self.dtype,
            name="cross_attn",
        )(
            query,
            value,
            None,
            reference_points_cam,
            bev_mask,
            spatial_shapes,
            deterministic=deterministic,
            precomputed=sca_precomputed,
        )
        # lidar branch: single-level deformable attention over the lidar
        # BEV grid at the CURRENT frame's 2D reference points
        # (`encoder.py:572-580` passes ref_2d[bs:], the current half of
        # the hybrid stack)
        ref_cur = hybrid_ref_2d[:, 1]  # [bs, q, 1, 2]
        new_query2 = CustomMSDeformableAttention(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            num_levels=1,
            num_points=self.lidar_num_points,
            fused_msda="off",
            dtype=self.dtype,
            name="lidar_cross_attn",
        )(
            query,
            lidar_bev,
            None,
            ref_cur,
            ((bev_h, bev_w),),
            deterministic=deterministic,
        )
        w = self.param(
            "cross_model_weights",
            nn.initializers.constant(0.5),
            (),
            jnp.float32,
        ).astype(new_query1.dtype)
        query = w * new_query1 + (1.0 - w) * new_query2
        query = nn.LayerNorm(dtype=self.dtype, name="norm2")(query)
        query = FFN(
            embed_dims=self.embed_dims,
            feedforward_channels=self.feedforward_channels,
            dropout=self.ffn_dropout,
            dtype=self.dtype,
            name="ffn",
        )(query, deterministic=deterministic)
        query = nn.LayerNorm(dtype=self.dtype, name="norm3")(query)
        return query
