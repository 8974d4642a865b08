"""DETR-style detection decoder with iterative box refinement.

Mirrors `modules/decoder.py:52-129` (DetectionTransformerDecoder) and the
mmcv `DetrTransformerDecoderLayer` assembled by the configs
(`bevformer_base.py:107-131`): MHA self-attn -> LN -> single-level
deformable cross-attn over the BEV map -> LN -> FFN -> LN, with detached
reference-point refinement after every layer.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from bevformer_tpu.models.attention import CustomMSDeformableAttention
from bevformer_tpu.models.layers import FFN, MultiheadAttention, inverse_sigmoid


class DetrDecoderLayer(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 512
    ffn_dropout: float = 0.1
    attn_dropout: float = 0.1
    fused_msda: Any = "off"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [bs, q, e]
        bev_value: jnp.ndarray,  # [bs, k, e]
        query_pos: jnp.ndarray,
        reference_points: jnp.ndarray,  # [bs, q, 1, 2]
        bev_spatial_shape: Tuple[int, int],
        attn_mask: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        query = MultiheadAttention(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            attn_drop=self.attn_dropout,
            proj_drop=self.attn_dropout,
            dtype=self.dtype,
            name="self_attn",
        )(query, query_pos=query_pos, attn_mask=attn_mask,
          deterministic=deterministic)
        query = nn.LayerNorm(dtype=self.dtype, name="norm1")(query)
        query = CustomMSDeformableAttention(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            num_levels=1,
            fused_msda=self.fused_msda,
            dtype=self.dtype,
            name="cross_attn",
        )(
            query,
            bev_value,
            query_pos,
            reference_points,
            (bev_spatial_shape,),
            deterministic=deterministic,
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


class DetectionTransformerDecoder(nn.Module):
    """Returns per-layer states and per-layer (input) reference points.

    `reg_branch_fn(layer_idx, states)` must return the raw 10-dim regression
    used for refinement (`decoder.py:105-118`): xy += ref[:2] (inv-sigmoid
    space), z (dim 4) += ref[2], then sigmoid + detach.
    """

    num_layers: int = 6
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 512
    ffn_dropout: float = 0.1
    # GroupDETR (V2): block-diagonal self-attention so query groups don't
    # attend to each other in training (`modules/group_attention.py:149-157`;
    # the reference folds groups into the batch — a block mask is the same
    # computation with static shapes). At eval only one group is present.
    group_detr: int = 1
    fused_msda: Any = "off"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [bs, q, e]
        bev_value: jnp.ndarray,  # [bs, k, e]
        query_pos: jnp.ndarray,
        reference_points: jnp.ndarray,  # [bs, q, 3] sigmoid space
        bev_spatial_shape: Tuple[int, int],
        reg_branch_fn: Optional[Callable] = None,
        *,
        num_groups_present: int = 1,
        deterministic: bool = True,
    ):
        attn_mask = None
        if num_groups_present > 1:
            q = query.shape[1]
            per = q // num_groups_present
            gid = jnp.arange(q) // per
            attn_mask = gid[:, None] != gid[None, :]  # True = masked
        output = query
        intermediate = []
        intermediate_refs = []
        for lid in range(self.num_layers):
            ref_input = reference_points[..., :2][:, :, None, :]  # [bs,q,1,2]
            output = DetrDecoderLayer(
                embed_dims=self.embed_dims,
                num_heads=self.num_heads,
                feedforward_channels=self.feedforward_channels,
                ffn_dropout=self.ffn_dropout,
                fused_msda=self.fused_msda,
                dtype=self.dtype,
                name=f"layer{lid}",
            )(
                output,
                bev_value,
                query_pos,
                ref_input,
                bev_spatial_shape,
                attn_mask,
                deterministic=deterministic,
            )

            if reg_branch_fn is not None:
                tmp = reg_branch_fn(lid, output)  # [bs, q, code_size]
                new_xy = tmp[..., 0:2] + inverse_sigmoid(reference_points[..., 0:2])
                new_z = tmp[..., 4:5] + inverse_sigmoid(reference_points[..., 2:3])
                new_ref = jax.nn.sigmoid(
                    jnp.concatenate([new_xy, new_z], axis=-1)
                )
                reference_points = jax.lax.stop_gradient(new_ref)

            intermediate.append(output)
            intermediate_refs.append(reference_points)

        return jnp.stack(intermediate), jnp.stack(intermediate_refs)
