"""Relative position embedding over a feature grid.

Port of the reference's `RelPositionEmbedding`
(`/root/reference/projects/mmdet3d_plugin/models/utils/position_embedding.py:5-33`):
per grid cell, (cos, sin) of the normalized row/column angle -> a bias-free
linear lift to `num_pos_feats` channels -> optional LayerNorm. Registered
but unused by every shipped BEVFormer config; provided for parity.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class RelPositionEmbedding(nn.Module):
    """Returns [H*W, num_pos_feats] position features for an [..., H, W]
    grid (the reference takes a [B, C, H, W] tensor and uses only H/W)."""

    num_pos_feats: int = 64
    pos_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: int, w: int) -> jnp.ndarray:
        y = jnp.arange(h, dtype=jnp.float32) / max(float(h - 1), 1.0)
        x = jnp.arange(w, dtype=jnp.float32) / max(float(w - 1), 1.0)
        y_axis = jnp.stack(
            [jnp.cos(y * np.pi), jnp.sin(y * np.pi)], axis=1
        )  # [H, 2]
        x_axis = jnp.stack(
            [jnp.cos(x * np.pi), jnp.sin(x * np.pi)], axis=1
        )  # [W, 2]
        pos = jnp.concatenate(
            [
                jnp.repeat(y_axis[:, None, :], w, axis=1),
                jnp.repeat(x_axis[None, :, :], h, axis=0),
            ],
            axis=-1,
        ).reshape(h * w, 4)
        pos = nn.Dense(
            self.num_pos_feats, use_bias=False, dtype=self.dtype, name="fc"
        )(pos.astype(self.dtype))
        if self.pos_norm:
            pos = nn.LayerNorm(dtype=self.dtype, name="norm")(pos)
        return pos
