"""BEVFormerV2 transformer: encoder-only BEV extractor + multi-frame fusion.

Mirrors `modules/transformerV2.py`:
  * `PerceptionTransformerBEVEncoderFlax` — no CAN-bus shift, no prev-BEV
    rotate (TSA degenerates to plain deformable self-attention with the
    (query, query) queue); optional inverse-BEV-grid warp undoing the
    GlobalRotScaleTrans augmentation (`transformerV2.py:142-173`).
  * `ResNetFusion` — concat per-frame BEVs channel-wise, BasicBlock stack,
    Linear+LN head (`transformerV2.py:16-51`).
  * `PerceptionTransformerV2Flax` — encoder + fusion + DETR decoder with
    learned initial reference points (`transformerV2.py:177-353`).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from bevformer_tpu.models.decoder import DetectionTransformerDecoder
from bevformer_tpu.models.encoder import BEVFormerEncoder
from bevformer_tpu.models.resnet import make_norm


def bev_grid_sample(bev: jnp.ndarray, grid_xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear grid_sample (align_corners=False, zeros padding).

    bev: [H, W, C]; grid_xy: [H, W, 2] normalized [-1, 1] sample coords.
    """
    h, w, c = bev.shape
    gx = (grid_xy[..., 0] + 1.0) * w / 2.0 - 0.5
    gy = (grid_xy[..., 1] + 1.0) * h / 2.0 - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    tx = gx - x0
    ty = gy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    flat = bev.reshape(h * w, c)
    out = jnp.zeros((h, w, c), bev.dtype)
    for dy, dx, wt in (
        (0, 0, (1 - tx) * (1 - ty)),
        (0, 1, tx * (1 - ty)),
        (1, 0, (1 - tx) * ty),
        (1, 1, tx * ty),
    ):
        xx = x0 + dx
        yy = y0 + dy
        valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
        g = flat[idx.reshape(-1)].reshape(h, w, c)
        out = out + g * (wt * valid.astype(jnp.float32))[..., None].astype(
            bev.dtype
        )
    return out


class BasicBlock(nn.Module):
    features: int
    downsample: bool = False
    norm: str = "bn"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ura = not train
        identity = x
        out = nn.Conv(
            self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        out = make_norm(self.norm, self.features, self.dtype, "bn1")(out, ura)
        out = nn.relu(out)
        out = nn.Conv(
            self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="conv2",
        )(out)
        out = make_norm(self.norm, self.features, self.dtype, "bn2")(out, ura)
        if self.downsample:
            identity = nn.Conv(
                self.features, (3, 3), padding=[(1, 1), (1, 1)],
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = make_norm(
                self.norm, self.features, self.dtype, "downsample_bn"
            )(identity, ura)
        return nn.relu(out + identity)


class ResNetFusion(nn.Module):
    """`transformerV2.py:16-51`: fuse T per-frame BEV maps."""

    out_channels: int
    inter_channels: int
    num_layer: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, bevs: Sequence[jnp.ndarray], bev_h: int, bev_w: int,
                 train: bool = False):
        # bevs: list of [bs, H*W, C] -> [bs, H, W, T*C]
        bs = bevs[0].shape[0]
        x = jnp.concatenate(
            [b.reshape(bs, bev_h, bev_w, -1) for b in bevs], axis=-1
        )
        in_ch = x.shape[-1]
        for i in range(self.num_layer):
            x = BasicBlock(
                features=self.inter_channels,
                downsample=(i == 0 and self.inter_channels != in_ch),
                dtype=self.dtype,
                name=f"block{i}",
            )(x, train)
        x = x.reshape(bs, bev_h * bev_w, self.inter_channels)
        x = nn.Dense(self.out_channels, dtype=self.dtype, name="out_fc")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="out_ln")(x)
        return x


class PerceptionTransformerV2Flax(nn.Module):
    """Encoder + optional multi-frame fusion + decoder (V2)."""

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
    use_cams_embeds: bool = True
    sca_capacity_ratio: float = 0.0
    fused_msda: Any = "off"
    use_remat: bool = False
    frames: Tuple[int, ...] = (0,)
    num_fusion: int = 3
    inter_channels: Optional[int] = None
    group_detr: int = 1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        e = self.embed_dims
        self.level_embeds = self.param(
            "level_embeds",
            nn.initializers.normal(stddev=1.0),
            (self.num_feature_levels, e),
        )
        if self.use_cams_embeds:
            self.cams_embeds = self.param(
                "cams_embeds", nn.initializers.normal(stddev=1.0),
                (self.num_cams, e),
            )
        self.reference_points_fc = nn.Dense(
            3, dtype=jnp.float32, name="reference_points"
        )
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
            group_detr=self.group_detr,
            dtype=self.dtype,
            name="decoder",
        )
        if len(self.frames) > 1:
            self.fusion = ResNetFusion(
                out_channels=e,
                inter_channels=(
                    self.inter_channels
                    if self.inter_channels is not None
                    else len(self.frames) * e
                ),
                num_layer=self.num_fusion,
                dtype=self.dtype,
                name="fusion",
            )

    def _flatten_feats(self, mlvl_feats):
        feat_flat = []
        spatial_shapes = []
        for lvl, feat in enumerate(mlvl_feats):
            bs, cams, h, w, e = feat.shape
            f = feat.reshape(bs, cams, h * w, e)
            if self.use_cams_embeds:
                f = f + self.cams_embeds[None, :, None, :].astype(f.dtype)
            f = f + self.level_embeds[None, None, lvl : lvl + 1, :].astype(
                f.dtype
            )
            feat_flat.append(f)
            spatial_shapes.append((h, w))
        return jnp.concatenate(feat_flat, axis=2), tuple(spatial_shapes)

    def get_bev_features(
        self,
        mlvl_feats,
        bev_queries,  # [HW, e]
        bev_pos,  # [bs, HW, e]
        bev_h,
        bev_w,
        lidar2img,
        img_shape,
        bda_mat: Optional[jnp.ndarray] = None,  # [bs, 2, 2] BEV unwarp
        *,
        deterministic: bool = True,
    ):
        bs = mlvl_feats[0].shape[0]
        queries = jnp.broadcast_to(
            bev_queries[None], (bs, bev_h * bev_w, self.embed_dims)
        ).astype(self.dtype)
        value, spatial_shapes = self._flatten_feats(mlvl_feats)

        bev = self.encoder(
            queries,
            value,
            bev_pos.astype(self.dtype),
            None,  # no prev BEV in the V2 encoder (`transformerV2.py:139`)
            jnp.zeros((bs,), bool),
            jnp.zeros((bs, 2), jnp.float32),
            lidar2img,
            img_shape,
            spatial_shapes,
            bev_h,
            bev_w,
            deterministic=deterministic,
        )

        if bda_mat is not None:
            # undo GlobalRotScaleTrans: sample at bda-rotated grid coords
            # (`transformerV2.py:144-172`)
            ys = (jnp.arange(bev_h, dtype=jnp.float32) + 0.5) / bev_h
            xs = (jnp.arange(bev_w, dtype=jnp.float32) + 0.5) / bev_w
            gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
            grid = jnp.stack([gx, gy], -1) * 2.0 - 1.0  # [H, W, 2]

            def warp(b, m):
                g = jnp.einsum("ij,hwj->hwi", m.astype(jnp.float32), grid)
                img = b.reshape(bev_h, bev_w, -1)
                return bev_grid_sample(img, g).reshape(bev_h * bev_w, -1)

            bev = jax.vmap(warp)(bev, bda_mat)
        return bev

    def __call__(
        self,
        mlvl_feats,
        bev_queries,
        object_query_embed,  # [num_query, 2e]
        bev_pos,
        bev_h,
        bev_w,
        lidar2img,
        img_shape,
        prev_bev_list: Optional[List[Optional[jnp.ndarray]]] = None,
        bda_mat: Optional[jnp.ndarray] = None,
        reg_branch_fn=None,
        *,
        num_groups_present: int = 1,
        train_fusion: bool = False,
        deterministic: bool = True,
    ):
        bev_embed = self.get_bev_features(
            mlvl_feats,
            bev_queries,
            bev_pos,
            bev_h,
            bev_w,
            lidar2img,
            img_shape,
            bda_mat,
            deterministic=deterministic,
        )

        if len(self.frames) > 1:
            cur = list(self.frames).index(0)
            bevs = list(prev_bev_list) if prev_bev_list is not None else [
                None
            ] * len(self.frames)
            bevs[cur] = bev_embed
            for i in range(1, cur + 1):  # fill missing history
                if bevs[cur - i] is None:
                    bevs[cur - i] = jax.lax.stop_gradient(bevs[cur - i + 1])
            for i in range(cur + 1, len(self.frames)):  # fill future
                if bevs[i] is None:
                    bevs[i] = jax.lax.stop_gradient(bevs[i - 1])
            bev_embed = self.fusion(
                bevs, bev_h, bev_w, train=train_fusion
            )

        bs = bev_embed.shape[0]
        e = self.embed_dims
        query_pos = jnp.broadcast_to(
            object_query_embed[None, :, :e], (bs,) + object_query_embed[:, :e].shape
        ).astype(self.dtype)
        query = jnp.broadcast_to(
            object_query_embed[None, :, e:], (bs,) + object_query_embed[:, e:].shape
        ).astype(self.dtype)

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
            num_groups_present=num_groups_present,
            deterministic=deterministic,
        )
        return bev_embed, inter_states, init_reference, inter_references
