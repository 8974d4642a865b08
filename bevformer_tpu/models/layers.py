"""Shared flax building blocks.

Torch-equivalent primitives used across the BEVFormer stack: FFN with
residual (mmcv `FFN`), packed-projection multi-head attention
(torch `nn.MultiheadAttention` semantics, used by the DETR decoder self-attn,
config `bevformer_base.py:112-117`), and the learned BEV positional encoding
(mmdet `LearnedPositionalEncoding`).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp


class FFN(nn.Module):
    """mmcv-style FFN: Linear -> ReLU -> Dropout -> Linear -> Dropout + res."""

    embed_dims: int
    feedforward_channels: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, identity=None, *, deterministic: bool = True):
        if identity is None:
            identity = x
        h = nn.Dense(self.feedforward_channels, dtype=self.dtype, name="fc1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.embed_dims, dtype=self.dtype, name="fc2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return identity + h


class MultiheadAttention(nn.Module):
    """torch `nn.MultiheadAttention`-semantics MHA (packed qkv projections).

    Used for decoder self-attention. Inputs are batch-first [bs, n, E].
    """

    embed_dims: int
    num_heads: int
    attn_drop: float = 0.0
    proj_drop: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query,
        key=None,
        value=None,
        identity=None,
        query_pos=None,
        key_pos=None,
        attn_mask=None,
        *,
        deterministic: bool = True,
    ):
        if key is None:
            key = query
        if value is None:
            value = key
        if identity is None:
            identity = query
        if key_pos is None and query_pos is not None and key.shape == query.shape:
            key_pos = query_pos
        q = query + query_pos if query_pos is not None else query
        k = key + key_pos if key_pos is not None else key
        v = value

        e = self.embed_dims
        h = self.num_heads
        dh = e // h
        q_p = nn.Dense(e, dtype=self.dtype, name="q_proj")(q)
        k_p = nn.Dense(e, dtype=self.dtype, name="k_proj")(k)
        v_p = nn.Dense(e, dtype=self.dtype, name="v_proj")(v)

        bs, nq, _ = q_p.shape
        nk = k_p.shape[1]
        q_p = q_p.reshape(bs, nq, h, dh).transpose(0, 2, 1, 3)
        k_p = k_p.reshape(bs, nk, h, dh).transpose(0, 2, 1, 3)
        v_p = v_p.reshape(bs, nk, h, dh).transpose(0, 2, 1, 3)

        scale = 1.0 / jnp.sqrt(jnp.array(dh, jnp.float32))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q_p, k_p) * scale
        if attn_mask is not None:
            logits = jnp.where(attn_mask, -1e9, logits)
        attn = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q_p.dtype)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v_p)
        out = out.transpose(0, 2, 1, 3).reshape(bs, nq, e)
        out = nn.Dense(e, dtype=self.dtype, name="out_proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return identity + out


class LearnedPositionalEncoding(nn.Module):
    """mmdet LearnedPositionalEncoding over the BEV grid.

    Produces [bs, bev_h*bev_w, 2*num_feats] position features:
    channels = concat(col_embed[x], row_embed[y]) per cell.
    """

    num_feats: int
    row_num_embed: int
    col_num_embed: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, bs: int):
        # torch nn.Embedding init is N(0, 1)
        row = self.param(
            "row_embed",
            nn.initializers.normal(stddev=1.0),
            (self.row_num_embed, self.num_feats),
        )
        col = self.param(
            "col_embed",
            nn.initializers.normal(stddev=1.0),
            (self.col_num_embed, self.num_feats),
        )
        h, w = self.row_num_embed, self.col_num_embed
        x_emb = jnp.broadcast_to(col[None, :, :], (h, w, self.num_feats))
        y_emb = jnp.broadcast_to(row[:, None, :], (h, w, self.num_feats))
        pos = jnp.concatenate([x_emb, y_emb], axis=-1)  # [h, w, 2F]
        pos = pos.reshape(h * w, 2 * self.num_feats).astype(self.dtype)
        return jnp.broadcast_to(pos[None], (bs, h * w, 2 * self.num_feats))


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Matches `modules/decoder.py:34-49`."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.maximum(x, eps)
    x2 = jnp.maximum(1.0 - x, eps)
    return jnp.log(x1 / x2)


class MLP(nn.Module):
    """Simple MLP stack used for cls/reg branches and the can-bus encoder."""

    layer_dims: tuple
    activate_final: bool = False
    use_layernorm: bool = False
    activation: Callable = nn.relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = len(self.layer_dims)
        for i, dim in enumerate(self.layer_dims):
            x = nn.Dense(dim, dtype=self.dtype, name=f"fc{i}")(x)
            if i < n - 1 or self.activate_final:
                if self.use_layernorm:
                    x = nn.LayerNorm(dtype=self.dtype, name=f"ln{i}")(x)
                x = self.activation(x)
        return x
