"""PerceptionTransformer: BEV feature extraction + object decoding.

Mirrors `modules/transformer.py:27-289`: CAN-bus conditioned BEV queries,
ego-motion shift + prev-BEV rotation, camera/level embeddings on the
flattened multi-scale features, encoder, then the DETR decoder with learned
initial reference points.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from bevformer_tpu.core import geometry
from bevformer_tpu.models.decoder import DetectionTransformerDecoder
from bevformer_tpu.models.encoder import BEVFormerEncoder


class PerceptionTransformer(nn.Module):
    embed_dims: int = 256
    num_feature_levels: int = 4
    num_cams: int = 6
    encoder_layers: int = 6
    decoder_layers: int = 6
    num_heads: int = 8
    feedforward_channels: int = 512
    ffn_dropout: float = 0.1
    num_points_in_pillar: int = 4
    pc_range: Tuple[float, ...] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    rotate_prev_bev: bool = True
    use_shift: bool = True
    use_can_bus: bool = True
    can_bus_norm: bool = True
    use_cams_embeds: bool = True
    sca_capacity_ratio: float = 0.0
    # fused Pallas msda kernel mode ('auto'|'off'|'fp32'|'bf16')
    fused_msda: Any = "off"
    use_remat: bool = False
    rotate_center: Tuple[float, float] = (100.0, 100.0)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        e = self.embed_dims
        self.level_embeds = self.param(
            "level_embeds",
            nn.initializers.normal(stddev=1.0),
            (self.num_feature_levels, e),
        )
        self.cams_embeds = self.param(
            "cams_embeds", nn.initializers.normal(stddev=1.0), (self.num_cams, e)
        )
        self.reference_points_fc = nn.Dense(3, dtype=jnp.float32, name="reference_points")
        self.can_bus_fc1 = nn.Dense(e // 2, dtype=self.dtype, name="can_bus_fc1")
        self.can_bus_fc2 = nn.Dense(e, dtype=self.dtype, name="can_bus_fc2")
        if self.can_bus_norm:
            self.can_bus_ln = nn.LayerNorm(dtype=self.dtype, name="can_bus_ln")
        self.encoder = BEVFormerEncoder(
            num_layers=self.encoder_layers,
            embed_dims=e,
            num_heads=self.num_heads,
            feedforward_channels=self.feedforward_channels,
            ffn_dropout=self.ffn_dropout,
            num_cams=self.num_cams,
            num_levels=self.num_feature_levels,
            num_points_in_pillar=self.num_points_in_pillar,
            pc_range=self.pc_range,
            sca_capacity_ratio=self.sca_capacity_ratio,
            fused_msda=self.fused_msda,
            use_remat=self.use_remat,
            dtype=self.dtype,
            name="encoder",
        )
        self.decoder = DetectionTransformerDecoder(
            fused_msda=self.fused_msda,
            num_layers=self.decoder_layers,
            embed_dims=e,
            num_heads=self.num_heads,
            feedforward_channels=self.feedforward_channels,
            ffn_dropout=self.ffn_dropout,
            dtype=self.dtype,
            name="decoder",
        )

    def _flatten_feats(self, mlvl_feats: Sequence[jnp.ndarray]):
        """[bs, cams, h, w, e] per level -> [bs, cams, K, e] + static shapes."""
        feat_flat = []
        spatial_shapes = []
        for lvl, feat in enumerate(mlvl_feats):
            bs, cams, h, w, e = feat.shape
            f = feat.reshape(bs, cams, h * w, e)
            if self.use_cams_embeds:
                f = f + self.cams_embeds[None, :, None, :].astype(f.dtype)
            f = f + self.level_embeds[None, None, lvl : lvl + 1, :].astype(f.dtype)
            feat_flat.append(f)
            spatial_shapes.append((h, w))
        return jnp.concatenate(feat_flat, axis=2), tuple(spatial_shapes)

    def get_bev_features(
        self,
        mlvl_feats: Sequence[jnp.ndarray],
        bev_queries: jnp.ndarray,  # [HW, e]
        bev_pos: jnp.ndarray,  # [bs, HW, e]
        bev_h: int,
        bev_w: int,
        grid_length: Tuple[float, float],
        can_bus: jnp.ndarray,  # [bs, 18]
        lidar2img: jnp.ndarray,  # [bs, cams, 4, 4]
        img_shape: Tuple[int, int],
        prev_bev: Optional[jnp.ndarray],  # [bs, HW, e]
        has_prev: jnp.ndarray,  # [bs] bool
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        bs = mlvl_feats[0].shape[0]
        queries = jnp.broadcast_to(
            bev_queries[None], (bs, bev_h * bev_w, self.embed_dims)
        ).astype(self.dtype)

        # ego-motion shift (`transformer.py:122-141`)
        shift = geometry.bev_shift(
            can_bus[:, 0],
            can_bus[:, 1],
            can_bus[:, -2],
            grid_length,
            bev_h,
            bev_w,
            use_shift=self.use_shift,
        )

        if prev_bev is not None and self.rotate_prev_bev:
            rotated = geometry.rotate_prev_bev(
                prev_bev.astype(jnp.float32),
                can_bus[:, -1],
                bev_h,
                bev_w,
                self.rotate_center,
            ).astype(prev_bev.dtype)
            hasb = has_prev.reshape(bs, 1, 1)
            prev_bev = jnp.where(hasb, rotated, prev_bev)

        # can-bus embedding (`transformer.py:158-162`)
        if self.use_can_bus:
            cb = self.can_bus_fc1(can_bus.astype(self.dtype))
            cb = nn.relu(cb)
            cb = self.can_bus_fc2(cb)
            cb = nn.relu(cb)
            if self.can_bus_norm:
                cb = self.can_bus_ln(cb)
            queries = queries + cb[:, None, :]

        value, spatial_shapes = self._flatten_feats(mlvl_feats)

        return self.encoder(
            queries,
            value,
            bev_pos.astype(self.dtype),
            prev_bev,
            has_prev,
            shift,
            lidar2img,
            img_shape,
            spatial_shapes,
            bev_h,
            bev_w,
            deterministic=deterministic,
        )

    def __call__(
        self,
        mlvl_feats,
        bev_queries,
        object_query_embed,  # [num_query, 2e]
        bev_pos,
        bev_h,
        bev_w,
        grid_length,
        can_bus,
        lidar2img,
        img_shape,
        prev_bev,
        has_prev,
        reg_branch_fn=None,
        *,
        deterministic: bool = True,
    ):
        bev_embed = self.get_bev_features(
            mlvl_feats,
            bev_queries,
            bev_pos,
            bev_h,
            bev_w,
            grid_length,
            can_bus,
            lidar2img,
            img_shape,
            prev_bev,
            has_prev,
            deterministic=deterministic,
        )

        bs = bev_embed.shape[0]
        e = self.embed_dims
        query_pos = object_query_embed[:, :e][None].astype(self.dtype)
        query = object_query_embed[:, e:][None].astype(self.dtype)
        query_pos = jnp.broadcast_to(query_pos, (bs,) + query_pos.shape[1:])
        query = jnp.broadcast_to(query, (bs,) + query.shape[1:])

        reference_points = jax.nn.sigmoid(
            self.reference_points_fc(query_pos.astype(jnp.float32))
        )
        init_reference = reference_points

        inter_states, inter_references = self.decoder(
            query,
            bev_embed,
            query_pos,
            reference_points,
            (bev_h, bev_w),
            reg_branch_fn,
            deterministic=deterministic,
        )
        return bev_embed, inter_states, init_reference, inter_references
