"""PyTorch replicas of the reference BEVFormer modules, used as parity
oracles.

Each class reimplements the *semantics* of the corresponding reference
module (cited per class) with torch, using the reference's CPU execution
path (`multi_scale_deformable_attn_pytorch` / grid_sample) for sampling.
Parameter names/layouts follow the reference state_dict so tensors exported
by `runtime.checkpoint.export_reference_state_dict` load directly.

These are test fixtures: written from the reference behavior as spec, they
give activation-level evidence that the JAX modules match the reference
without needing nuScenes data or a GPU.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def multi_scale_deformable_attn(value, spatial_shapes, locations, weights):
    """mmcv's pure-PyTorch msda fallback semantics (the reference CPU path).

    value [B,K,H,D], locations [B,Q,H,L,P,2] normalized, weights
    [B,Q,H,L,P] -> [B, Q, H*D].
    """
    b, k, h, d = value.shape
    _, q, _, l, p, _ = locations.shape
    value_list = value.split([hh * ww for hh, ww in spatial_shapes], dim=1)
    grids = 2 * locations - 1
    sampled = []
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        v = value_list[lvl].flatten(2).transpose(1, 2).reshape(b * h, d, hh, ww)
        g = grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)
        sampled.append(
            F.grid_sample(
                v, g, mode="bilinear", padding_mode="zeros",
                align_corners=False,
            )
        )
    attn = weights.transpose(1, 2).reshape(b * h, 1, q, l * p)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * attn).sum(-1)
    return out.view(b, h * d, q).transpose(1, 2).contiguous()


def point_sampling(ref_3d, pc_range, lidar2img, img_shape):
    """`modules/encoder.py:87-150`: project pillar points to cameras.

    ref_3d [bs, D, Q, 3] normalized; lidar2img [bs, cams, 4, 4];
    img_shape (h, w) = PADDED image size. Returns
    reference_points_cam [cams, bs, Q, D, 2], bev_mask [cams, bs, Q, D].
    """
    pts = ref_3d.clone()
    for i in range(3):
        pts[..., i] = pts[..., i] * (pc_range[i + 3] - pc_range[i]) + pc_range[i]
    pts = torch.cat([pts, torch.ones_like(pts[..., :1])], -1)  # [bs,D,Q,4]
    d, q = pts.shape[1], pts.shape[2]
    cams = lidar2img.shape[1]
    pts = pts.permute(1, 0, 2, 3)[:, :, None].repeat(1, 1, cams, 1, 1)
    proj = torch.einsum(
        "bcij,dbcqj->dbcqi", lidar2img.float(), pts.float()
    )
    eps = 1e-5
    mask = proj[..., 2:3] > eps
    xy = proj[..., 0:2] / torch.maximum(
        proj[..., 2:3], torch.ones_like(proj[..., 2:3]) * eps
    )
    xy = xy / torch.tensor(
        [img_shape[1], img_shape[0]], dtype=xy.dtype
    )
    mask = (
        mask
        & (xy[..., 1:2] > 0.0)
        & (xy[..., 1:2] < 1.0)
        & (xy[..., 0:1] > 0.0)
        & (xy[..., 0:1] < 1.0)
    )
    ref_cam = xy.permute(2, 1, 3, 0, 4)  # [cams, bs, Q, D, 2]
    mask = mask.permute(2, 1, 3, 0, 4).squeeze(-1)
    return ref_cam, mask


class TemporalSelfAttention(nn.Module):
    """`modules/temporal_self_attention.py:26-272` (batch_first=True)."""

    def __init__(self, embed_dims=256, num_heads=8, num_levels=1,
                 num_points=4, num_bev_queue=2):
        super().__init__()
        self.embed_dims = embed_dims
        self.num_heads = num_heads
        self.num_levels = num_levels
        self.num_points = num_points
        self.num_bev_queue = num_bev_queue
        self.sampling_offsets = nn.Linear(
            embed_dims * num_bev_queue,
            num_bev_queue * num_heads * num_levels * num_points * 2,
        )
        self.attention_weights = nn.Linear(
            embed_dims * num_bev_queue,
            num_bev_queue * num_heads * num_levels * num_points,
        )
        self.value_proj = nn.Linear(embed_dims, embed_dims)
        self.output_proj = nn.Linear(embed_dims, embed_dims)

    def forward(self, query, value, query_pos, reference_points,
                spatial_shapes):
        # query [bs, q, e]; value [bs*2, q, e] rows (prev, cur) per batch;
        # reference_points [bs*2, q, 1, 2]; spatial_shapes [(h, w)]
        bs, num_query, e = query.shape
        identity = query
        if query_pos is not None:
            query = query + query_pos
        h, l, p, nq = (self.num_heads, self.num_levels, self.num_points,
                       self.num_bev_queue)

        query = torch.cat([value[:bs], query], -1)
        v = self.value_proj(value)
        v = v.reshape(bs * nq, -1, h, self.embed_dims // h)

        offsets = self.sampling_offsets(query).view(
            bs, num_query, h, nq, l, p, 2
        ).permute(0, 3, 1, 2, 4, 5, 6).reshape(bs * nq, num_query, h, l, p, 2)
        weights = self.attention_weights(query).view(
            bs, num_query, h, nq, l * p
        ).softmax(-1).view(bs, num_query, h, nq, l, p)
        weights = weights.permute(0, 3, 1, 2, 4, 5).reshape(
            bs * nq, num_query, h, l, p
        )

        normalizer = torch.tensor(
            [[ww, hh] for hh, ww in spatial_shapes], dtype=torch.float32
        )
        locations = (
            reference_points[:, :, None, :, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )
        out = multi_scale_deformable_attn(v, spatial_shapes, locations, weights)
        # queue fuse by mean (`temporal_self_attention.py:255-262`)
        out = out.permute(1, 2, 0).view(num_query, e, bs, nq).mean(-1)
        out = out.permute(2, 0, 1)
        return self.output_proj(out) + identity


class MSDeformableAttention3D(nn.Module):
    """`modules/spatial_cross_attention.py:179-399` (batch_first=True)."""

    def __init__(self, embed_dims=256, num_heads=8, num_levels=4,
                 num_points=8):
        super().__init__()
        self.embed_dims = embed_dims
        self.num_heads = num_heads
        self.num_levels = num_levels
        self.num_points = num_points
        self.sampling_offsets = nn.Linear(
            embed_dims, num_heads * num_levels * num_points * 2
        )
        self.attention_weights = nn.Linear(
            embed_dims, num_heads * num_levels * num_points
        )
        self.value_proj = nn.Linear(embed_dims, embed_dims)

    def forward(self, query, value, reference_points, spatial_shapes):
        # query [b, q, e]; value [b, k, e]; reference_points [b, q, Z, 2]
        b, q, _ = query.shape
        h, l, p = self.num_heads, self.num_levels, self.num_points
        v = self.value_proj(value).view(b, -1, h, self.embed_dims // h)
        offsets = self.sampling_offsets(query).view(b, q, h, l, p, 2)
        weights = self.attention_weights(query).view(
            b, q, h, l * p
        ).softmax(-1).view(b, q, h, l, p)

        normalizer = torch.tensor(
            [[ww, hh] for hh, ww in spatial_shapes], dtype=torch.float32
        )
        nz = reference_points.shape[2]
        offsets = offsets / normalizer[None, None, None, :, None, :]
        offsets = offsets.view(b, q, h, l, p // nz, nz, 2)
        ref = reference_points[:, :, None, None, None, :, :]
        locations = (ref + offsets).view(b, q, h, l, p, 2)
        return multi_scale_deformable_attn(v, spatial_shapes, locations, weights)


class SpatialCrossAttention(nn.Module):
    """`modules/spatial_cross_attention.py:32-175`: the reference's dynamic
    per-camera `nonzero()` rebatch, verbatim semantics (incl. using batch
    0's visibility indexes)."""

    def __init__(self, embed_dims=256, num_cams=6, num_heads=8, num_levels=4,
                 num_points=8):
        super().__init__()
        self.embed_dims = embed_dims
        self.num_cams = num_cams
        self.deformable_attention = MSDeformableAttention3D(
            embed_dims, num_heads, num_levels, num_points
        )
        self.output_proj = nn.Linear(embed_dims, embed_dims)

    def forward(self, query, value, query_pos, reference_points_cam,
                bev_mask, spatial_shapes):
        # query [bs, q, e]; value [cams, k, bs, e];
        # reference_points_cam [cams, bs, q, D, 2]; bev_mask [cams, bs, q, D]
        inp_residual = query
        slots = torch.zeros_like(query)
        if query_pos is not None:
            query = query + query_pos
        bs, num_query, _ = query.shape
        d = reference_points_cam.size(3)

        indexes = [
            m[0].sum(-1).nonzero().squeeze(-1) for m in bev_mask
        ]
        max_len = max(len(i) for i in indexes)

        queries_rebatch = query.new_zeros(
            (bs, self.num_cams, max_len, self.embed_dims)
        )
        ref_rebatch = reference_points_cam.new_zeros(
            (bs, self.num_cams, max_len, d, 2)
        )
        for j in range(bs):
            for i, ref_per_img in enumerate(reference_points_cam):
                idx = indexes[i]
                queries_rebatch[j, i, : len(idx)] = query[j, idx]
                ref_rebatch[j, i, : len(idx)] = ref_per_img[j, idx]

        cams, k, bs_, e = value.shape
        v = value.permute(2, 0, 1, 3).reshape(bs * self.num_cams, k, e)
        queries = self.deformable_attention(
            queries_rebatch.view(bs * self.num_cams, max_len, e),
            v,
            ref_rebatch.view(bs * self.num_cams, max_len, d, 2),
            spatial_shapes,
        ).view(bs, self.num_cams, max_len, e)

        for j in range(bs):
            for i, idx in enumerate(indexes):
                slots[j, idx] += queries[j, i, : len(idx)]

        count = bev_mask.sum(-1) > 0
        count = count.permute(1, 2, 0).sum(-1).clamp(min=1.0)
        slots = slots / count[..., None]
        return self.output_proj(slots) + inp_residual


class FFN(nn.Module):
    """mmcv FFN (2 layers, ReLU) used by all reference transformer layers."""

    def __init__(self, embed_dims=256, feedforward_channels=512):
        super().__init__()
        self.layers = nn.Sequential(
            nn.Sequential(nn.Linear(embed_dims, feedforward_channels), nn.ReLU()),
            nn.Linear(feedforward_channels, embed_dims),
        )

    def forward(self, x):
        return x + self.layers(x)


class BEVFormerLayer(nn.Module):
    """`modules/encoder.py:242-406`: operation_order =
    (self_attn, norm, cross_attn, norm, ffn, norm)."""

    def __init__(self, embed_dims=256, num_heads=8, num_levels=4,
                 sca_points=8, tsa_points=4, num_cams=6,
                 feedforward_channels=512):
        super().__init__()
        self.attentions = nn.ModuleList([
            TemporalSelfAttention(embed_dims, num_heads, 1, tsa_points),
            SpatialCrossAttention(embed_dims, num_cams, num_heads,
                                  num_levels, sca_points),
        ])
        self.norms = nn.ModuleList(
            [nn.LayerNorm(embed_dims) for _ in range(3)]
        )
        self.ffns = nn.ModuleList([FFN(embed_dims, feedforward_channels)])

    def forward(self, query, value, bev_pos, tsa_value, hybrid_ref_2d,
                reference_points_cam, bev_mask, spatial_shapes,
                bev_shape):
        q = self.attentions[0](
            query, tsa_value, bev_pos, hybrid_ref_2d, [bev_shape]
        )
        q = self.norms[0](q)
        q = self.attentions[1](
            q, value, None, reference_points_cam, bev_mask, spatial_shapes
        )
        q = self.norms[1](q)
        q = self.ffns[0](q)
        q = self.norms[2](q)
        return q


class CustomMSDeformableAttention(nn.Module):
    """`modules/decoder.py:133-345`: single-level deformable decoder
    cross-attention with output projection and residual."""

    def __init__(self, embed_dims=256, num_heads=8, num_levels=1,
                 num_points=4):
        super().__init__()
        self.embed_dims = embed_dims
        self.num_heads = num_heads
        self.num_levels = num_levels
        self.num_points = num_points
        self.sampling_offsets = nn.Linear(
            embed_dims, num_heads * num_levels * num_points * 2
        )
        self.attention_weights = nn.Linear(
            embed_dims, num_heads * num_levels * num_points
        )
        self.value_proj = nn.Linear(embed_dims, embed_dims)
        self.output_proj = nn.Linear(embed_dims, embed_dims)

    def forward(self, query, value, query_pos, reference_points,
                spatial_shapes):
        identity = query
        if query_pos is not None:
            query = query + query_pos
        b, q, _ = query.shape
        h, l, p = self.num_heads, self.num_levels, self.num_points
        v = self.value_proj(value).view(b, -1, h, self.embed_dims // h)
        offsets = self.sampling_offsets(query).view(b, q, h, l, p, 2)
        weights = self.attention_weights(query).view(
            b, q, h, l * p
        ).softmax(-1).view(b, q, h, l, p)
        normalizer = torch.tensor(
            [[ww, hh] for hh, ww in spatial_shapes], dtype=torch.float32
        )
        locations = (
            reference_points[:, :, None, :, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )
        out = multi_scale_deformable_attn(v, spatial_shapes, locations, weights)
        return self.output_proj(out) + identity


def cls_branch(embed_dims, num_classes, num_reg_fcs=2):
    """`dense_heads/bevformer_head.py:95-107` classification branch."""
    layers = []
    for _ in range(num_reg_fcs):
        layers += [nn.Linear(embed_dims, embed_dims),
                   nn.LayerNorm(embed_dims), nn.ReLU(inplace=True)]
    layers.append(nn.Linear(embed_dims, num_classes))
    return nn.Sequential(*layers)


def reg_branch(embed_dims, code_size, num_reg_fcs=2):
    """`dense_heads/bevformer_head.py:109-117` regression branch."""
    layers = []
    for _ in range(num_reg_fcs):
        layers += [nn.Linear(embed_dims, embed_dims), nn.ReLU()]
    layers.append(nn.Linear(embed_dims, code_size))
    return nn.Sequential(*layers)


class CanBusMLP(nn.Module):
    """`modules/transformer.py:113-121` can-bus embedding MLP."""

    def __init__(self, embed_dims=256, norm=True):
        super().__init__()
        self.mlp = nn.Sequential(
            nn.Linear(18, embed_dims // 2), nn.ReLU(inplace=True),
            nn.Linear(embed_dims // 2, embed_dims), nn.ReLU(inplace=True),
        )
        self.norm = nn.LayerNorm(embed_dims) if norm else nn.Identity()

    def forward(self, can_bus):
        return self.norm(self.mlp(can_bus))


class Bottleneck(nn.Module):
    """mmdet ResNet bottleneck, style='pytorch' (stride on the 3x3 conv),
    BN frozen (eval running stats) — `mmdet/models/backbones/resnet.py`
    semantics as used by the reference configs."""

    def __init__(self, inplanes, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + idt)


class ResNet(nn.Module):
    """Reference backbone (`img_backbone`): 7x7 stem + 4 bottleneck stages,
    frozen BN everywhere (eval mode)."""

    def __init__(self, blocks=(3, 4, 6, 3), out_indices=(1, 2, 3)):
        super().__init__()
        self.out_indices = out_indices
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        inplanes, planes = 64, 64
        for s, n in enumerate(blocks):
            stride = 1 if s == 0 else 2
            layers = [Bottleneck(inplanes, planes, stride, downsample=True)]
            inplanes = planes * 4
            layers += [Bottleneck(inplanes, planes) for _ in range(n - 1)]
            setattr(self, f"layer{s + 1}", nn.Sequential(*layers))
            planes *= 2

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        outs = []
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
            if s in self.out_indices:
                outs.append(x)
        return outs


class FPN(nn.Module):
    """mmdet FPN with add_extra_convs='on_output' +
    relu_before_extra_convs (`img_neck` of the base config)."""

    def __init__(self, in_channels, out_channels=256, num_outs=4):
        super().__init__()
        self.num_outs = num_outs
        self.lateral_convs = nn.ModuleList(
            [nn.Conv2d(c, out_channels, 1) for c in in_channels]
        )
        self.fpn_convs = nn.ModuleList(
            [nn.Conv2d(out_channels, out_channels, 3, padding=1)
             for _ in in_channels]
        )
        for _ in range(num_outs - len(in_channels)):
            self.fpn_convs.append(
                nn.Conv2d(out_channels, out_channels, 3, stride=2, padding=1)
            )

    def forward(self, inputs):
        laterals = [c(x) for c, x in zip(self.lateral_convs, inputs)]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + F.interpolate(
                laterals[i], size=laterals[i - 1].shape[-2:], mode="nearest"
            )
        outs = [c(l) for c, l in zip(self.fpn_convs, laterals)]
        used = len(laterals)
        src = outs[-1]
        for i in range(used, self.num_outs):
            if i > used:
                src = F.relu(src)
            src = self.fpn_convs[i](src)
            outs.append(src)
        return outs


# ---------------------------------------------------------------------------
# Full-model replica (round 3): whole BEVFormer v1 eval forward, with module
# attribute names matching the REFERENCE state_dict keys so the entire
# replica loads directly from `export_reference_state_dict` output
# (`detectors/bevformer.py:236-292`, `dense_heads/bevformer_head.py:118-203`,
# `modules/transformer.py:104-289`, `modules/decoder.py:52-129`).
# ---------------------------------------------------------------------------


class LearnedPositionalEncoding(nn.Module):
    """mmdet LearnedPositionalEncoding: channels = cat(col_embed[x],
    row_embed[y]) per BEV cell."""

    def __init__(self, num_feats, row_num_embed, col_num_embed):
        super().__init__()
        self.row_embed = nn.Embedding(row_num_embed, num_feats)
        self.col_embed = nn.Embedding(col_num_embed, num_feats)
        self.h = row_num_embed
        self.w = col_num_embed

    def forward(self, bs):
        x = torch.arange(self.w)
        y = torch.arange(self.h)
        xe = self.col_embed(x)  # [w, f]
        ye = self.row_embed(y)  # [h, f]
        pos = torch.cat(
            [
                xe.unsqueeze(0).repeat(self.h, 1, 1),
                ye.unsqueeze(1).repeat(1, self.w, 1),
            ],
            dim=-1,
        )  # [h, w, 2f]
        return pos.reshape(1, self.h * self.w, -1).repeat(bs, 1, 1)


class _MHAWrap(nn.Module):
    """mmcv MultiheadAttention wrapper: the torch module lives at `.attn`
    (reference keys `attentions.0.attn.in_proj_weight`...)."""

    def __init__(self, embed_dims, num_heads):
        super().__init__()
        self.attn = nn.MultiheadAttention(embed_dims, num_heads,
                                          batch_first=True)

    def forward(self, query, query_pos):
        q = query + query_pos
        out, _ = self.attn(q, q, query)
        return out + query


class DetrDecoderLayer(nn.Module):
    """mmcv DetrTransformerDecoderLayer as configured by the reference
    (`bevformer_base.py:107-131`): MHA -> LN -> CustomMSDeformableAttention
    -> LN -> FFN -> LN."""

    def __init__(self, embed_dims=256, num_heads=8, feedforward_channels=512):
        super().__init__()
        self.attentions = nn.ModuleList([
            _MHAWrap(embed_dims, num_heads),
            CustomMSDeformableAttention(embed_dims, num_heads, 1, 4),
        ])
        self.norms = nn.ModuleList([nn.LayerNorm(embed_dims) for _ in range(3)])
        self.ffns = nn.ModuleList([FFN(embed_dims, feedforward_channels)])

    def forward(self, query, bev_value, query_pos, reference_points,
                bev_shape):
        q = self.attentions[0](query, query_pos)
        q = self.norms[0](q)
        q = self.attentions[1](q, bev_value, query_pos, reference_points,
                               [bev_shape])
        q = self.norms[1](q)
        q = self.ffns[0](q)
        q = self.norms[2](q)
        return q


def inverse_sigmoid(x, eps=1e-5):
    x = x.clamp(min=eps, max=1 - eps)
    return torch.log(x / (1 - x))


class DetectionTransformerDecoder(nn.Module):
    """`modules/decoder.py:52-129`: per-layer detached reference
    refinement through the reg branches."""

    def __init__(self, num_layers, embed_dims=256, num_heads=8,
                 feedforward_channels=512):
        super().__init__()
        self.layers = nn.ModuleList([
            DetrDecoderLayer(embed_dims, num_heads, feedforward_channels)
            for _ in range(num_layers)
        ])

    def forward(self, query, bev_value, query_pos, reference_points,
                bev_shape, reg_branches):
        intermediate = []
        inter_refs = []
        for lid, layer in enumerate(self.layers):
            ref2d = reference_points[..., :2].unsqueeze(2)  # [bs, q, 1, 2]
            query = layer(query, bev_value, query_pos, ref2d, bev_shape)
            tmp = reg_branches[lid](query)
            new_ref = torch.zeros_like(reference_points)
            new_ref[..., :2] = tmp[..., :2] + inverse_sigmoid(
                reference_points[..., :2]
            )
            new_ref[..., 2:3] = tmp[..., 4:5] + inverse_sigmoid(
                reference_points[..., 2:3]
            )
            reference_points = new_ref.sigmoid().detach()
            intermediate.append(query)
            inter_refs.append(reference_points)
        return torch.stack(intermediate), torch.stack(inter_refs)


class BEVFormerEncoder(nn.Module):
    """`modules/encoder.py:24-239` eval forward for the FIRST frame
    (has_prev=False: hybrid refs are both the current grid, the TSA value
    queue is (layer input, layer input))."""

    def __init__(self, num_layers, embed_dims, num_heads, num_levels,
                 sca_points, tsa_points, num_cams, feedforward_channels,
                 pc_range, num_points_in_pillar=4):
        super().__init__()
        self.layers = nn.ModuleList([
            BEVFormerLayer(embed_dims, num_heads, num_levels, sca_points,
                           tsa_points, num_cams, feedforward_channels)
            for _ in range(num_layers)
        ])
        self.pc_range = pc_range
        self.npp = num_points_in_pillar

    def forward(self, bev_query, value, bev_pos, lidar2img, img_shape,
                spatial_shapes, bev_h, bev_w, prev_bev=None, shift=None):
        bs = bev_query.shape[0]
        # 3D pillar refs (`encoder.py:47-85`), normalized: z sampled at
        # (0.5 .. Z-0.5)/Z with Z the METRIC pillar extent
        zsize = self.pc_range[5] - self.pc_range[2]
        zs = (torch.linspace(0.5, zsize - 0.5, self.npp) / zsize)
        xs = (torch.arange(bev_w, dtype=torch.float32) + 0.5) / bev_w
        ys = (torch.arange(bev_h, dtype=torch.float32) + 0.5) / bev_h
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        q = bev_h * bev_w
        ref3d = torch.stack([
            gx.reshape(-1).unsqueeze(0).repeat(self.npp, 1),
            gy.reshape(-1).unsqueeze(0).repeat(self.npp, 1),
            zs.unsqueeze(1).repeat(1, q),
        ], dim=-1).unsqueeze(0)  # [1, D, Q, 3]
        ref_cam, bev_mask = point_sampling(
            ref3d, self.pc_range, lidar2img, img_shape
        )
        ref2d = torch.stack([gx.reshape(-1), gy.reshape(-1)], -1).reshape(
            1, q, 1, 2
        ).repeat(bs, 1, 1, 1)
        if prev_bev is not None:
            # second frame (`encoder.py:196-212`): slot 0 = ego-shifted
            # refs sampling the (rotated) prev BEV, slot 1 = current grid;
            # the shipped code DOES clone shift_ref_2d (the "bug" comment
            # at `encoder.py:196` describes code that never shipped)
            shift_ref = ref2d.clone()
            shift_ref = shift_ref + shift[None, None, None, :]
            hybrid = torch.cat([shift_ref, ref2d], 0)
            # TSA value is stacked ONCE with the ENCODER INPUT query and
            # reused by every layer (`encoder.py:206-208` stacks before
            # the layer loop)
            tsa_value_fixed = torch.cat([prev_bev, bev_query], 0)
        else:
            hybrid = torch.cat([ref2d, ref2d], 0)  # (prev=cur, cur), bs*2
            tsa_value_fixed = None

        query = bev_query
        for layer in self.layers:
            if tsa_value_fixed is None:
                tsa_value = torch.cat([query, query], 0)  # [bs*2, q, e]
            else:
                tsa_value = tsa_value_fixed
            query = layer(query, value, bev_pos, tsa_value, hybrid,
                          ref_cam, bev_mask, spatial_shapes,
                          (bev_h, bev_w))
        return query


def rotate_nearest(img_chw, angle_deg, center_xy):
    """torchvision `F.rotate` (tensor path, NEAREST, zero fill) for the
    prev-BEV rotation (`transformer.py:143-156`): torchvision passes
    `-angle` into `_get_inverse_affine_matrix` then samples with
    `grid_sample(align_corners=False, mode='nearest')`, i.e.
      src = R(angle) @ (out + 0.5 - c) + c - 0.5, nearest-rounded.
    (torchvision itself is not installed in this container.)"""
    c, h, w = img_chw.shape
    cx, cy = center_xy
    r = float(angle_deg) * np.pi / 180.0
    cos_r, sin_r = np.cos(r), np.sin(r)
    ys = torch.arange(h, dtype=torch.float32) + 0.5 - cy
    xs = torch.arange(w, dtype=torch.float32) + 0.5 - cx
    yy, xx = torch.meshgrid(ys, xs, indexing="ij")
    src_x = cos_r * xx - sin_r * yy + (cx - 0.5)
    src_y = sin_r * xx + cos_r * yy + (cy - 0.5)
    ix = torch.round(src_x).long()
    iy = torch.round(src_y).long()
    valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ixc = ix.clamp(0, w - 1)
    iyc = iy.clamp(0, h - 1)
    out = img_chw[:, iyc, ixc]
    return torch.where(valid[None], out, torch.zeros_like(out))


class PerceptionTransformer(nn.Module):
    """`modules/transformer.py:27-289` (eval; second-frame path: CAN-bus
    ego shift + prev-BEV rotate + hybrid TSA queue,
    `transformer.py:104-201`)."""

    def __init__(self, embed_dims, num_levels, num_cams, encoder_layers,
                 decoder_layers, num_heads, feedforward_channels,
                 sca_points, tsa_points, pc_range):
        super().__init__()
        self.embed_dims = embed_dims
        self.level_embeds = nn.Parameter(torch.zeros(num_levels, embed_dims))
        self.cams_embeds = nn.Parameter(torch.zeros(num_cams, embed_dims))
        self.reference_points = nn.Linear(embed_dims, 3)
        self.can_bus_mlp = nn.Sequential(
            nn.Linear(18, embed_dims // 2), nn.ReLU(inplace=True),
            nn.Linear(embed_dims // 2, embed_dims), nn.ReLU(inplace=True),
        )
        self.can_bus_mlp.add_module("norm", nn.LayerNorm(embed_dims))
        self.encoder = BEVFormerEncoder(
            encoder_layers, embed_dims, num_heads, num_levels, 8,
            tsa_points, num_cams, feedforward_channels, pc_range,
        )
        self.decoder = DetectionTransformerDecoder(
            decoder_layers, embed_dims, num_heads, feedforward_channels,
        )
        self.pc_range = pc_range
        self.rotate_center = (100.0, 100.0)

    def forward(self, mlvl_feats, bev_queries, object_query_embed, bev_pos,
                bev_h, bev_w, can_bus, lidar2img, img_shape, reg_branches,
                prev_bev=None):
        bs = mlvl_feats[0].shape[0]
        e = self.embed_dims
        queries = bev_queries.unsqueeze(0).repeat(bs, 1, 1)

        # ego-motion grid shift (`transformer.py:122-141`), use_shift=1
        pc = self.pc_range
        grid_length_y = (pc[4] - pc[1]) / bev_h
        grid_length_x = (pc[3] - pc[0]) / bev_w
        delta_x = float(can_bus[0, 0])
        delta_y = float(can_bus[0, 1])
        ego_angle = float(can_bus[0, -2]) / np.pi * 180.0
        translation_length = np.sqrt(delta_x ** 2 + delta_y ** 2)
        translation_angle = np.arctan2(delta_y, delta_x) / np.pi * 180.0
        bev_angle = ego_angle - translation_angle
        shift_y = (translation_length * np.cos(bev_angle / 180.0 * np.pi)
                   / grid_length_y / bev_h)
        shift_x = (translation_length * np.sin(bev_angle / 180.0 * np.pi)
                   / grid_length_x / bev_w)
        shift = torch.tensor([shift_x, shift_y], dtype=torch.float32)

        if prev_bev is not None:
            # per-sample prev-BEV rotation by the CAN-bus angle delta
            # (`transformer.py:143-156`), torchvision-rotate semantics
            rotation_angle = float(can_bus[0, -1])
            img = prev_bev[0].reshape(bev_h, bev_w, -1).permute(2, 0, 1)
            img = rotate_nearest(img, rotation_angle, self.rotate_center)
            prev_bev = img.permute(1, 2, 0).reshape(
                1, bev_h * bev_w, -1
            )

        queries = queries + self.can_bus_mlp(can_bus)[:, None, :]

        feat_flat = []
        spatial_shapes = []
        for lvl, feat in enumerate(mlvl_feats):
            b_, cams, h, w, _ = feat.shape
            f = feat.reshape(b_, cams, h * w, e)
            f = f + self.cams_embeds[None, :, None, :]
            f = f + self.level_embeds[None, None, lvl: lvl + 1, :]
            feat_flat.append(f)
            spatial_shapes.append((h, w))
        value = torch.cat(feat_flat, dim=2)  # [bs, cams, K, e]
        assert bs == 1, "replica SCA value layout assumes bs == 1"

        bev_embed = self.encoder(
            queries, value[0].reshape(cams, -1, bs, e), bev_pos,
            lidar2img, img_shape, spatial_shapes, bev_h, bev_w,
            prev_bev=prev_bev, shift=shift,
        )

        query_pos = object_query_embed[:, :e].unsqueeze(0).repeat(bs, 1, 1)
        query = object_query_embed[:, e:].unsqueeze(0).repeat(bs, 1, 1)
        reference_points = self.reference_points(query_pos).sigmoid()
        init_ref = reference_points
        hs, inter_refs = self.decoder(
            query, bev_embed, query_pos, reference_points, (bev_h, bev_w),
            reg_branches,
        )
        return bev_embed, hs, init_ref, inter_refs


class _ConvModule(nn.Module):
    """mmcv ConvModule (conv-only): parameters live at `.conv`."""

    def __init__(self, *a, **k):
        super().__init__()
        self.conv = nn.Conv2d(*a, **k)

    def forward(self, x):
        return self.conv(x)


class FPNRef(FPN):
    """FPN whose conv parameters nest under `.conv` like mmcv ConvModule
    (reference keys `img_neck.lateral_convs.N.conv.weight`)."""

    def __init__(self, in_channels, out_channels=256, num_outs=4):
        nn.Module.__init__(self)
        self.num_outs = num_outs
        self.lateral_convs = nn.ModuleList(
            [_ConvModule(c, out_channels, 1) for c in in_channels]
        )
        self.fpn_convs = nn.ModuleList(
            [_ConvModule(out_channels, out_channels, 3, padding=1)
             for _ in in_channels]
        )
        for _ in range(num_outs - len(in_channels)):
            self.fpn_convs.append(
                _ConvModule(out_channels, out_channels, 3, stride=2,
                            padding=1)
            )


class BEVFormerHead(nn.Module):
    """`dense_heads/bevformer_head.py:17-203` eval forward."""

    def __init__(self, cfg, num_levels):
        super().__init__()
        e = cfg.embed_dims
        self.cfg = cfg
        self.bev_embedding = nn.Embedding(cfg.bev_h * cfg.bev_w, e)
        self.query_embedding = nn.Embedding(cfg.num_query, 2 * e)
        self.positional_encoding = LearnedPositionalEncoding(
            e // 2, cfg.bev_h, cfg.bev_w
        )
        self.cls_branches = nn.ModuleList([
            cls_branch(e, cfg.num_classes, cfg.num_reg_fcs)
            for _ in range(cfg.decoder_layers)
        ])
        self.reg_branches = nn.ModuleList([
            reg_branch(e, cfg.code_size, cfg.num_reg_fcs)
            for _ in range(cfg.decoder_layers)
        ])
        self.transformer = PerceptionTransformer(
            e, num_levels, cfg.data.num_cams, cfg.encoder_layers,
            cfg.decoder_layers, cfg.num_heads, cfg.feedforward_channels,
            cfg.sca_num_points, cfg.tsa_num_points, cfg.pc_range,
        )

    def forward(self, mlvl_feats, can_bus, lidar2img, img_shape,
                prev_bev=None):
        c = self.cfg
        bs = mlvl_feats[0].shape[0]
        bev_pos = self.positional_encoding(bs)
        bev_embed, hs, init_ref, inter_refs = self.transformer(
            mlvl_feats, self.bev_embedding.weight,
            self.query_embedding.weight, bev_pos, c.bev_h, c.bev_w,
            can_bus, lidar2img, img_shape, self.reg_branches,
            prev_bev=prev_bev,
        )
        x0, y0, z0, x1, y1, z1 = c.pc_range
        out_cls, out_coord = [], []
        for lvl in range(hs.shape[0]):
            ref = init_ref if lvl == 0 else inter_refs[lvl - 1]
            ref = inverse_sigmoid(ref)
            oc = self.cls_branches[lvl](hs[lvl])
            tmp = self.reg_branches[lvl](hs[lvl])
            xy = (tmp[..., 0:2] + ref[..., 0:2]).sigmoid()
            z = (tmp[..., 4:5] + ref[..., 2:3]).sigmoid()
            cx = xy[..., 0:1] * (x1 - x0) + x0
            cy = xy[..., 1:2] * (y1 - y0) + y0
            cz = z * (z1 - z0) + z0
            coord = torch.cat([cx, cy, tmp[..., 2:4], cz, tmp[..., 5:]], -1)
            out_cls.append(oc)
            out_coord.append(coord)
        return bev_embed, torch.stack(out_cls), torch.stack(out_coord)


class BEVFormerDetector(nn.Module):
    """`detectors/bevformer.py` eval path (grid mask off, first frame)."""

    def __init__(self, cfg, blocks):
        super().__init__()
        self.cfg = cfg
        self.img_backbone = ResNet(
            blocks, out_indices=cfg.backbone_out_indices
        )
        self.img_neck = FPNRef(
            cfg.neck_in_channels, cfg.embed_dims, cfg.num_feature_levels
        )
        self.pts_bbox_head = BEVFormerHead(cfg, cfg.num_feature_levels)

    def forward(self, images, can_bus, lidar2img, prev_bev=None):
        c = self.cfg
        bs, cams, h, w, _ = images.shape
        x = images.reshape(bs * cams, h, w, 3).permute(0, 3, 1, 2)
        feats = self.img_neck(self.img_backbone(x))
        mlvl = [
            f.permute(0, 2, 3, 1).reshape(bs, cams, f.shape[2], f.shape[3],
                                          f.shape[1])
            for f in feats
        ]
        return self.pts_bbox_head(
            mlvl, can_bus, lidar2img, c.data.img_size, prev_bev=prev_bev
        )


# --------------------------- V2 (BEVFormerV2) ---------------------------

class BasicBlockRef(nn.Module):
    """mmdet `BasicBlock` as used by ResNetFusion (`transformerV2.py:22-35`):
    conv3x3-BN-relu-conv3x3-BN (+3x3-conv downsample) + residual relu."""

    def __init__(self, in_ch, out_ch, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(out_ch)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 3, padding=1, bias=False),
                nn.BatchNorm2d(out_ch),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + identity)


class ResNetFusionRef(nn.Module):
    """`transformerV2.py:16-51`: cat per-frame BEVs channel-wise (NCHW),
    BasicBlock stack, then nchw->n(hw)c + Linear + LayerNorm."""

    def __init__(self, in_channels, out_channels, inter_channels, num_layer):
        super().__init__()
        layers = []
        for i in range(num_layer):
            if i == 0:
                layers.append(
                    BasicBlockRef(in_channels, inter_channels,
                                  downsample=inter_channels != in_channels)
                )
            else:
                layers.append(BasicBlockRef(inter_channels, inter_channels))
        self.layers = nn.Sequential(*layers)
        self.layer_norm = nn.Sequential(
            nn.Linear(inter_channels, out_channels),
            nn.LayerNorm(out_channels),
        )

    def forward(self, x_list):
        x = torch.cat(x_list, 1).contiguous()  # [n, T*C, H, W]
        x = self.layers(x)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        return self.layer_norm(x)


def bev_unwarp_ref(bev_nchw, bda_mat2, bev_h, bev_w):
    """GlobalRotScaleTrans BEV unwarp (`transformerV2.py:144-172`):
    grid_sample at bda-rotated normalized grid coords, align_corners=False,
    zero padding."""
    ys = torch.linspace(0.5, bev_h - 0.5, bev_h) / bev_h
    xs = torch.linspace(0.5, bev_w - 0.5, bev_w) / bev_w
    gy, gx = torch.meshgrid(ys, xs, indexing="ij")
    grid = torch.stack((gx, gy), -1) * 2.0 - 1.0  # [H, W, 2]
    grid = grid.unsqueeze(0).unsqueeze(-1)  # [1, H, W, 2, 1]
    bda = bda_mat2.view(1, 1, 1, 2, 2).repeat(1, bev_h, bev_w, 1, 1)
    g = torch.matmul(bda, grid).squeeze(-1)  # [1, H, W, 2]
    return torch.nn.functional.grid_sample(
        bev_nchw, g, align_corners=False
    )


class GroupMultiheadAttentionRef(nn.Module):
    """`group_attention.py:19-162` (training fold: groups split along the
    query axis are folded into the batch so groups never attend to each
    other)."""

    def __init__(self, embed_dims, num_heads, group):
        super().__init__()
        self.attn = nn.MultiheadAttention(embed_dims, num_heads)
        self.group = group

    def forward(self, query, query_pos, training):
        # mmcv MultiheadAttention wrapper semantics: key=query, value=key,
        # pos added to query and key but NOT value
        identity = query
        q = (query + query_pos).transpose(0, 1)  # [nq, bs, e]
        k = q
        v = query.transpose(0, 1)
        nq = q.shape[0]
        if training:
            bs = q.shape[1]
            q = torch.cat(q.split(nq // self.group, dim=0), dim=1)
            k = torch.cat(k.split(nq // self.group, dim=0), dim=1)
            v = torch.cat(v.split(nq // self.group, dim=0), dim=1)
            out = self.attn(q, k, v)[0]
            out = torch.cat(out.split(bs, dim=1), dim=0)
        else:
            out = self.attn(q, k, v)[0]
        return identity + out.transpose(0, 1)


def quaternion_to_matrix_ref(q):
    """`boxes3d.py:17-45`."""
    r, i, j, k = torch.unbind(q, -1)
    two_s = 2.0 / (q * q).sum(-1)
    o = torch.stack(
        (
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ),
        -1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quaternion_ref(m):
    """Shepperd's method (pytorch3d matrix_to_quaternion equivalent as the
    reference uses; branch-selected on the trace)."""
    m00, m11, m22 = m[:, 0, 0], m[:, 1, 1], m[:, 2, 2]
    tr = m00 + m11 + m22
    out = torch.zeros(m.shape[0], 4)
    for n in range(m.shape[0]):
        t = tr[n]
        if t > 0:
            s = torch.sqrt(t + 1.0) * 2
            q = torch.stack([
                s / 4,
                (m[n, 2, 1] - m[n, 1, 2]) / s,
                (m[n, 0, 2] - m[n, 2, 0]) / s,
                (m[n, 1, 0] - m[n, 0, 1]) / s,
            ])
        elif m00[n] > m11[n] and m00[n] > m22[n]:
            s = torch.sqrt(1.0 + m00[n] - m11[n] - m22[n]) * 2
            q = torch.stack([
                (m[n, 2, 1] - m[n, 1, 2]) / s,
                s / 4,
                (m[n, 0, 1] + m[n, 1, 0]) / s,
                (m[n, 0, 2] + m[n, 2, 0]) / s,
            ])
        elif m11[n] > m22[n]:
            s = torch.sqrt(1.0 + m11[n] - m00[n] - m22[n]) * 2
            q = torch.stack([
                (m[n, 0, 2] - m[n, 2, 0]) / s,
                (m[n, 0, 1] + m[n, 1, 0]) / s,
                s / 4,
                (m[n, 1, 2] + m[n, 2, 1]) / s,
            ])
        else:
            s = torch.sqrt(1.0 + m22[n] - m00[n] - m11[n]) * 2
            q = torch.stack([
                (m[n, 1, 0] - m[n, 0, 1]) / s,
                (m[n, 0, 2] + m[n, 2, 0]) / s,
                (m[n, 1, 2] + m[n, 2, 1]) / s,
                s / 4,
            ])
        out[n] = q / q.norm()
    return out


def unproject_points2d_ref(pts, inv_k):
    homo = torch.cat([pts, torch.ones_like(pts[:, :1])], -1)
    return torch.einsum("nij,nj->ni", inv_k, homo)


def allocentric_to_egocentric_ref(quat, proj_ctr, inv_k):
    """`dd3d/utils/geometry.py:107-141`."""
    r_obj = quaternion_to_matrix_ref(quat)
    ray = unproject_points2d_ref(proj_ctr, inv_k)
    z = ray / ray.norm(dim=1, keepdim=True)
    y = z.new_tensor([[0.0, 1.0, 0.0]]) - z[:, 1:2] * z
    y = y / y.norm(dim=1, keepdim=True)
    x = torch.cross(y, z, dim=1)
    r_l2g = torch.stack([x, y, z], dim=-1)
    q = matrix_to_quaternion_ref(torch.bmm(r_l2g, r_obj))
    return q / q.norm(dim=1, keepdim=True)


_BOX3D_CORNER_MAPPING = torch.tensor(
    [[1, 1, 1, 1, -1, -1, -1, -1],
     [1, -1, -1, 1, 1, -1, -1, 1],
     [1, 1, -1, -1, 1, 1, -1, -1]], dtype=torch.float32
)


def boxes3d_corners_ref(quat, proj_ctr, depth, size_wlh, inv_k):
    """`boxes3d.py:76-97, 189-230` (Boxes3D.corners: tvec from the
    projective parametrization, wlh -> lwh swap)."""
    tvec = unproject_points2d_ref(proj_ctr, inv_k) * depth[:, None]
    qn = quat / quat.norm(dim=1, keepdim=True)
    r = quaternion_to_matrix_ref(qn)
    lwh = size_wlh[:, [1, 0, 2]]
    corners_obj = 0.5 * lwh.unsqueeze(1) * _BOX3D_CORNER_MAPPING.T.unsqueeze(0)
    return torch.einsum("nij,nkj->nki", r, corners_obj) + tvec[:, None, :]


def disentangled_box3d_losses_ref(pred, gt, inv_k, beta=0.05):
    """`disentangled_box3d_loss.py:12-47`: per-component corner smooth-l1,
    per-location 24-mean. pred/gt: dicts with quat/ctr/depth/size."""
    target = boxes3d_corners_ref(gt["quat"], gt["ctr"], gt["depth"],
                                 gt["size"], inv_k)
    out = {}
    for key in ("quat", "ctr", "depth", "size"):
        mixed = {k: (pred[k] if k == key else gt[k])
                 for k in ("quat", "ctr", "depth", "size")}
        corners = boxes3d_corners_ref(mixed["quat"], mixed["ctr"],
                                      mixed["depth"], mixed["size"], inv_k)
        d = (corners - target).abs()
        l1 = torch.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
        out[key] = l1.reshape(-1, 24).mean(dim=1)
    return out
