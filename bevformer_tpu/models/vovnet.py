"""VoVNet V2-99 backbone (flax, NHWC).

Replaces `models/backbones/vovnet.py:269` (used by the reference for
test-set submissions with DD3D-pretrained weights). One-Shot Aggregation
(OSA) modules with effective Squeeze-Excitation (eSE) and identity
residuals, stem of 3 convs, stages [1, 3, 9, 3] blocks for V2-99.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from bevformer_tpu.models.resnet import make_norm

# V2-99: stem 64/64/128; per-stage (stage_ch, concat_ch, layers_per_block,
# blocks)
V2_99 = dict(
    stem=(64, 64, 128),
    stage_ch=(128, 160, 192, 224),
    concat_ch=(256, 512, 768, 1024),
    layer_per_block=5,
    block_per_stage=(1, 3, 9, 3),
)


class ConvNorm(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    norm: str = "frozen"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = make_norm(self.norm, self.features, self.dtype, "bn")(x, not train)
        return nn.relu(x)


class ESE(nn.Module):
    """Effective squeeze-excitation: GAP -> 1x1 conv -> hsigmoid gate."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gap = x.mean(axis=(1, 2), keepdims=True)
        g = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="fc")(gap)
        hsig = jnp.clip(g + 3.0, 0.0, 6.0) / 6.0
        return x * hsig


class OSABlock(nn.Module):
    stage_ch: int
    concat_ch: int
    layer_per_block: int
    identity: bool = False
    depthwise: bool = False
    norm: str = "frozen"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity_feat = x
        outputs = [x]
        h = x
        for i in range(self.layer_per_block):
            h = ConvNorm(
                self.stage_ch, 3, norm=self.norm, dtype=self.dtype,
                name=f"layer{i}",
            )(h, train)
            outputs.append(h)
        h = jnp.concatenate(outputs, axis=-1)
        h = ConvNorm(
            self.concat_ch, 1, norm=self.norm, dtype=self.dtype, name="concat"
        )(h, train)
        h = ESE(self.concat_ch, dtype=self.dtype, name="ese")(h)
        if self.identity:
            h = h + identity_feat
        return h


class VoVNet(nn.Module):
    """V2-99; returns stages in out_indices (0 -> stage2 ... 3 -> stage5)."""

    out_indices: Tuple[int, ...] = (1, 2, 3)
    norm: str = "frozen"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = V2_99
        s1, s2, s3 = cfg["stem"]
        x = ConvNorm(s1, 3, 2, self.norm, self.dtype, name="stem1")(x, train)
        x = ConvNorm(s2, 3, 1, self.norm, self.dtype, name="stem2")(x, train)
        x = ConvNorm(s3, 3, 2, self.norm, self.dtype, name="stem3")(x, train)

        outs = []
        for stage in range(4):
            if stage > 0:
                x = nn.max_pool(
                    x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
                )
            for blk in range(cfg["block_per_stage"][stage]):
                x = OSABlock(
                    stage_ch=cfg["stage_ch"][stage],
                    concat_ch=cfg["concat_ch"][stage],
                    layer_per_block=cfg["layer_per_block"],
                    identity=(blk > 0),
                    norm=self.norm,
                    dtype=self.dtype,
                    name=f"stage{stage + 2}_block{blk}",
                )(x, train)
            if stage in self.out_indices:
                outs.append(x)
        return outs
