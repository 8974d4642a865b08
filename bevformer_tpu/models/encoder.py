"""BEVFormer encoder: stacked TSA + SCA layers over the BEV grid.

Mirrors `modules/encoder.py:24-406` with static shapes. The hybrid
(prev/current) reference-point trick and the queue-2 temporal attention are
kept; prev-BEV presence is a traced boolean so a single compiled program
serves both the first frame and the video steady state.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from bevformer_tpu.core import geometry
from bevformer_tpu.models.attention import (
    SpatialCrossAttention,
    TemporalSelfAttention,
    sca_capacity_precompute,
)
from bevformer_tpu.models.layers import FFN
from bevformer_tpu.runtime.mesh import maybe_shard


class BEVFormerLayer(nn.Module):
    """operation_order = (self_attn, norm, cross_attn, norm, ffn, norm)
    (`encoder.py:283-285`)."""

    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 512
    ffn_dropout: float = 0.1
    num_cams: int = 6
    num_levels: int = 4  # feature levels for SCA
    sca_num_points: int = 8
    tsa_num_points: int = 4
    sca_capacity_ratio: float = 0.0
    fused_msda: Any = "off"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [bs, q, e]
        value: jnp.ndarray,  # [bs, cams, k, e]
        bev_pos: jnp.ndarray,  # [bs, q, e]
        value_queue: jnp.ndarray,  # [bs, 2, q, e] TSA value (prev, initial)
        hybrid_ref_2d: jnp.ndarray,  # [bs, 2, q, 1, 2]
        reference_points_cam: jnp.ndarray,
        bev_mask: jnp.ndarray,
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
        query = SpatialCrossAttention(
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
            None,  # query_pos is None for SCA (`encoder.py:383-397`)
            reference_points_cam,
            bev_mask,
            spatial_shapes,
            deterministic=deterministic,
            precomputed=sca_precomputed,
        )
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


class _EncoderScanBody(nn.Module):
    """nn.scan body over identical encoder layers (stacked params keep the
    compiled program O(1) in depth; the axon compile relay rejects
    oversized HLO)."""

    embed_dims: int
    num_heads: int
    feedforward_channels: int
    ffn_dropout: float
    num_cams: int
    num_levels: int
    sca_capacity_ratio: float
    fused_msda: Any
    deterministic: bool
    has_prev_input: bool
    spatial_shapes: tuple
    bev_h: int
    bev_w: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, consts):
        output = carry
        (
            value,
            bev_pos,
            prev_bev,
            initial_query,
            hasq,
            hybrid_ref_2d,
            reference_points_cam,
            bev_mask,
            sca_precomputed,
        ) = consts
        spatial_shapes = self.spatial_shapes
        bev_h, bev_w = self.bev_h, self.bev_w
        if self.has_prev_input:
            slot0 = hasq * prev_bev.astype(output.dtype) + (1.0 - hasq) * output
            slot1 = hasq * initial_query + (1.0 - hasq) * output
        else:
            slot0 = output
            slot1 = output
        value_queue = jnp.stack([slot0, slot1], axis=1)
        output = BEVFormerLayer(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            feedforward_channels=self.feedforward_channels,
            ffn_dropout=self.ffn_dropout,
            num_cams=self.num_cams,
            num_levels=self.num_levels,
            sca_capacity_ratio=self.sca_capacity_ratio,
            fused_msda=self.fused_msda,
            dtype=self.dtype,
            name="layer",
        )(
            output,
            value,
            bev_pos,
            value_queue,
            hybrid_ref_2d,
            reference_points_cam,
            bev_mask,
            spatial_shapes,
            bev_h,
            bev_w,
            deterministic=self.deterministic,
            sca_precomputed=sca_precomputed,
        )
        output = maybe_shard(output, "dp", "sp", None)
        return output, None


class BEVFormerEncoder(nn.Module):
    """`encoder.py:24-239`. Computes reference points + camera projections
    once, then runs `num_layers` BEVFormerLayers."""

    num_layers: int = 6
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 512
    ffn_dropout: float = 0.1
    num_cams: int = 6
    num_levels: int = 4
    num_points_in_pillar: int = 4
    pc_range: Tuple[float, ...] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    sca_capacity_ratio: float = 0.0
    fused_msda: Any = "off"
    use_remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        bev_query: jnp.ndarray,  # [bs, q, e]
        value: jnp.ndarray,  # [bs, cams, k, e]
        bev_pos: jnp.ndarray,  # [bs, q, e]
        prev_bev: Optional[jnp.ndarray],  # [bs, q, e] or None
        has_prev: jnp.ndarray,  # [bs] bool (traced)
        shift: jnp.ndarray,  # [bs, 2]
        lidar2img: jnp.ndarray,  # [bs, cams, 4, 4]
        img_shape: Tuple[int, int],
        spatial_shapes: Tuple[Tuple[int, int], ...],
        bev_h: int,
        bev_w: int,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        bs, q, e = bev_query.shape

        ref_3d = geometry.reference_points_3d(
            bev_h,
            bev_w,
            self.pc_range[5] - self.pc_range[2],
            self.num_points_in_pillar,
            bs=bs,
        )
        ref_2d = geometry.reference_points_2d(bev_h, bev_w, bs=bs)

        reference_points_cam, bev_mask = geometry.point_sampling(
            ref_3d, self.pc_range, lidar2img, img_shape
        )

        # shifted prev refs + current refs -> queue axis (`encoder.py:196-212`)
        shift_ref_2d = ref_2d + shift[:, None, None, :]
        has = has_prev.reshape(bs, 1, 1, 1).astype(ref_2d.dtype)
        prev_ref = has * shift_ref_2d + (1.0 - has) * ref_2d
        hybrid_ref_2d = jnp.stack([prev_ref, ref_2d], axis=1)  # [bs,2,q,1,2]

        # TSA value queue semantics (`encoder.py:204-212` +
        # `temporal_self_attention.py:177-180`):
        #   with prev   : (prev_bev, initial bev_query), fixed for all layers
        #   without prev: (layer input, layer input), evolving per layer
        hasq = has_prev.reshape(bs, 1, 1).astype(bev_query.dtype)
        initial_query = bev_query

        # sequence-parallel: shard the BEV query axis over the 'sp' mesh
        # axis; camera value stays replicated (each query samples
        # independently -> no communication inside SCA/TSA)
        output = maybe_shard(bev_query, "dp", "sp", None)

        # frame-constant SCA routing (camera top-k + fused-kernel row sort)
        # computed ONCE and broadcast through the layer scan
        sca_pre = None
        if self.sca_capacity_ratio and self.sca_capacity_ratio < 1.0:
            sca_pre = sca_capacity_precompute(
                reference_points_cam, bev_mask, self.sca_capacity_ratio
            )

        zeros = jnp.zeros_like(output)
        consts = (
            value,
            bev_pos,
            prev_bev if prev_bev is not None else zeros,
            initial_query,
            hasq,
            hybrid_ref_2d,
            reference_points_cam,
            bev_mask,
            sca_pre,
        )
        # gradient checkpointing (reference's with_cp / torch.utils.checkpoint,
        # `mmdet ResNet`-style): recompute each encoder layer in the backward
        # pass instead of storing its activations; composed with nn.scan so
        # peak memory is O(1) in depth (prevent_cse is unneeded inside scan)
        body = _EncoderScanBody
        if self.use_remat:
            body = nn.remat(_EncoderScanBody, prevent_cse=False)
        scanned = nn.scan(
            body,
            # intermediates: per-layer audit scalars (fused_audit sows)
            variable_axes={"params": 0, "batch_stats": 0, "intermediates": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=nn.broadcast,
            length=self.num_layers,
        )(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            feedforward_channels=self.feedforward_channels,
            ffn_dropout=self.ffn_dropout,
            num_cams=self.num_cams,
            num_levels=self.num_levels,
            sca_capacity_ratio=self.sca_capacity_ratio,
            fused_msda=self.fused_msda,
            deterministic=deterministic,
            has_prev_input=prev_bev is not None,
            spatial_shapes=tuple(spatial_shapes),
            bev_h=bev_h,
            bev_w=bev_w,
            dtype=self.dtype,
            name="layers",
        )
        output, _ = scanned(output, consts)
        return output
