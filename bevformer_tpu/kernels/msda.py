"""Multi-scale deformable attention — the framework's core sampling op.

Replaces the reference's CUDA `ms_deform_attn_forward/backward`
(`/root/reference/projects/mmdet3d_plugin/bevformer/modules/
multi_scale_deformable_attn_function.py:15-124`, kernel loaded at
`modules/encoder.py:20-21`). Semantics (the spec is mmcv's pure-PyTorch
fallback `multi_scale_deformable_attn_pytorch`, used by the reference on CPU):

  For every (batch, query, head, level, point): bilinearly sample the value
  feature map of that level at `sampling_locations` (normalized [0,1],
  grid_sample align_corners=False convention => pixel = loc * size - 0.5,
  zero padding outside), multiply by the softmaxed `attention_weights`, and
  sum over (level, point).

Two implementations:
  * `ms_deform_attn_jnp` — pure-XLA gather formulation. Static shapes, fp32
    accumulation, differentiable. Used as the correctness oracle and the
    fallback path.
  * a fused Pallas TPU kernel (see `msda_pallas.py`) for the hot encoder /
    decoder paths, validated against the jnp version.

Layouts are batch-first: value [B, K, H, D], locations [B, Q, H, L, P, 2],
weights [B, Q, H, L, P] -> output [B, Q, H*D].
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _level_bounds(spatial_shapes: Sequence[Tuple[int, int]]):
    starts, sizes = [], []
    s = 0
    for h, w in spatial_shapes:
        starts.append(s)
        sizes.append(h * w)
        s += h * w
    return starts, sizes, s


@functools.partial(jax.jit, static_argnames=("spatial_shapes",))
def ms_deform_attn_jnp(
    value: jnp.ndarray,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Pure-XLA multi-scale deformable attention.

    Args:
      value: [B, K, H, D] where K = sum(h*w over levels).
      spatial_shapes: static tuple of (h, w) per level.
      sampling_locations: [B, Q, H, L, P, 2], normalized (x, y) in [0, 1].
      attention_weights: [B, Q, H, L, P], softmaxed over (L, P).

    Returns:
      [B, Q, H*D] (accumulated in fp32, cast back to value.dtype).
    """
    b, k, h, d = value.shape
    _, q, _, l, p, _ = sampling_locations.shape
    starts, sizes, total = _level_bounds(spatial_shapes)
    assert total == k, f"spatial_shapes {spatial_shapes} != num_keys {k}"

    loc = sampling_locations.astype(jnp.float32)
    attw = attention_weights.astype(jnp.float32)

    # [B, K, H, D] -> [B*H, K, D]
    val = jnp.swapaxes(value, 1, 2).reshape(b * h, k, d)

    out = jnp.zeros((b * h, q, d), jnp.float32)
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        val_l = jax.lax.dynamic_slice_in_dim(val, starts[lvl], sizes[lvl], 1)
        val_l = val_l.astype(jnp.float32)

        # pixel coords, grid_sample align_corners=False convention
        x = loc[:, :, :, lvl, :, 0] * ww - 0.5  # [B, Q, H, P]
        y = loc[:, :, :, lvl, :, 1] * hh - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = x - x0
        ty = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        w_l = attw[:, :, :, lvl, :]  # [B, Q, H, P]

        acc = jnp.zeros((b * h, q, d), jnp.float32)
        for dy, dx, wgt in (
            (0, 0, (1 - tx) * (1 - ty)),
            (0, 1, tx * (1 - ty)),
            (1, 0, (1 - tx) * ty),
            (1, 1, tx * ty),
        ):
            cx = x0i + dx
            cy = y0i + dy
            valid = (cx >= 0) & (cx < ww) & (cy >= 0) & (cy < hh)
            idx = jnp.clip(cy, 0, hh - 1) * ww + jnp.clip(cx, 0, ww - 1)
            # fold attention weight into the corner weight before gathering
            cw = wgt * w_l * valid.astype(jnp.float32)  # [B, Q, H, P]
            # [B, Q, H, P] -> [B*H, Q, P]
            idx_bh = jnp.swapaxes(idx, 1, 2).reshape(b * h, q, p)
            cw_bh = jnp.swapaxes(cw, 1, 2).reshape(b * h, q, p)
            gathered = jnp.take_along_axis(
                val_l[:, :, None, :],  # [B*H, K, 1, D]
                idx_bh.reshape(b * h, q * p)[:, :, None, None],
                axis=1,
            )  # [B*H, Q*P, 1, D]
            gathered = gathered.reshape(b * h, q, p, d)
            acc = acc + jnp.einsum(
                "nqp,nqpd->nqd", cw_bh, gathered,
                precision=jax.lax.Precision.HIGHEST,
            )
        out = out + acc

    out = out.reshape(b, h, q, d)
    out = jnp.swapaxes(out, 1, 2).reshape(b, q, h * d)
    return out.astype(value.dtype)


@functools.partial(jax.jit, static_argnames=("spatial_shapes",))
def ms_deform_attn_patch(
    value: jnp.ndarray,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Optimized XLA path: one 2x2-patch gather per level.

    TPU row gathers cost ~10-30 ns *per row*; the naive formulation issues
    4 corner gathers per (level) which dominated the whole model (~100 ms of
    a 111 ms bevformer_tiny forward). Gathering the 2x2 bilinear patch from
    a zero-padded value map in a single `lax.gather` per level cuts the
    gather count 4x while keeping exact grid_sample zeros-padding semantics
    (the pad ring provides the out-of-bounds zeros; fully out-of-range
    corners are zeroed through their weights).

    Same contract as `ms_deform_attn_jnp` (validated to agree in tests).
    """
    b, k, h, d = value.shape
    _, q, _, l, p, _ = sampling_locations.shape
    starts, sizes, total = _level_bounds(spatial_shapes)
    assert total == k, f"spatial_shapes {spatial_shapes} != num_keys {k}"

    loc = sampling_locations.astype(jnp.float32)
    attw = attention_weights.astype(jnp.float32)
    val = jnp.swapaxes(value, 1, 2).reshape(b * h, k, d)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    out = jnp.zeros((b * h, q, d), jnp.float32)
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        val_l = jax.lax.dynamic_slice_in_dim(val, starts[lvl], sizes[lvl], 1)
        # NOTE: gathering in bf16 instead of fp32 was measured SLOWER
        # (641 vs 507 ms at base-SCA shapes) — slice transfer granularity,
        # not bytes, dominates; keep the fp32 gather
        val_l = val_l.reshape(b * h, hh, ww, d).astype(jnp.float32)
        # 1-pixel zero ring = grid_sample zeros padding
        val_pad = jnp.pad(val_l, ((0, 0), (1, 1), (1, 1), (0, 0)))

        x = loc[:, :, :, lvl, :, 0] * ww - 0.5  # [B, Q, H, P]
        y = loc[:, :, :, lvl, :, 1] * hh - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = x - x0
        ty = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        # clamp patch origin into the padded map; zero the weights of any
        # corner whose true coordinate is outside [-1, H/W] (i.e. where the
        # clamp moved the patch)
        y0c = jnp.clip(y0i, -1, hh - 1)
        x0c = jnp.clip(x0i, -1, ww - 1)
        in_range = (y0i == y0c) & (x0i == x0c)

        wx = jnp.stack([1.0 - tx, tx], -1)  # [B, Q, H, P, 2]
        wy = jnp.stack([1.0 - ty, ty], -1)
        w22 = wy[..., :, None] * wx[..., None, :]  # [B, Q, H, P, 2, 2]
        w_l = attw[:, :, :, lvl, :] * in_range  # [B, Q, H, P]
        w22 = w22 * w_l[..., None, None]

        # [B, Q, H, P, ...] -> [B*H, Q*P, ...]
        def bh(xx, trailing):
            return jnp.swapaxes(xx, 1, 2).reshape((b * h, q * p) + trailing)

        starts_yx = jnp.stack([y0c + 1, x0c + 1], -1)  # [B, Q, H, P, 2]
        starts_bh = bh(starts_yx, (2,))
        w_bh = bh(w22, (2, 2))

        patches = jax.vmap(
            lambda v, s: jax.lax.gather(
                v,
                s,
                dimension_numbers=dnums,
                slice_sizes=(2, 2, d),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )
        )(val_pad, starts_bh)  # [B*H, Q*P, 2, 2, D]

        acc = jnp.einsum(
            "nkij,nkijd->nkd", w_bh, patches,
            precision=jax.lax.Precision.HIGHEST,
        )  # [B*H, Q*P, D]
        out = out + acc.reshape(b * h, q, p, d).sum(2)

    out = out.reshape(b, h, q, d)
    out = jnp.swapaxes(out, 1, 2).reshape(b, q, h * d)
    return out.astype(value.dtype)


@functools.partial(jax.jit, static_argnames=("spatial_shapes",))
def ms_deform_attn_onehot(
    value: jnp.ndarray,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """MXU formulation for small per-level K (<= ~2.5k keys).

    TPUs have no fast arbitrary gather (XLA: ~10-30 ns/slice; the Mosaic
    dynamic_gather shuffles only within one 8-sublane vreg). Instead the
    whole interpolation is expressed as a matmul: per (batch, head, query)
    a sparse weight row over the K keys accumulates all (level point x 4
    bilinear corners) contributions — built with fused broadcast-compares,
    reduced over points *before* the dot so the materialized operand is
    only [B*H, Q, K] — then a single einsum against the value block runs
    on the MXU. Exact same semantics as `ms_deform_attn_jnp`.
    """
    b, k, h, d = value.shape
    _, q, _, l, p, _ = sampling_locations.shape
    starts, sizes, total = _level_bounds(spatial_shapes)
    assert total == k

    loc = sampling_locations.astype(jnp.float32)
    attw = attention_weights.astype(jnp.float32)
    val = jnp.swapaxes(value, 1, 2).reshape(b * h, k, d).astype(jnp.float32)

    out = jnp.zeros((b * h, q, d), jnp.float32)
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        kl = hh * ww
        val_l = jax.lax.dynamic_slice_in_dim(val, starts[lvl], kl, 1)

        x = loc[:, :, :, lvl, :, 0] * ww - 0.5  # [B, Q, H, P]
        y = loc[:, :, :, lvl, :, 1] * hh - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = x - x0
        ty = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        w_l = attw[:, :, :, lvl, :]

        kio = jnp.arange(kl, dtype=jnp.int32)
        wq = jnp.zeros((b, q, h, kl), jnp.float32)
        for dy, dx, wt in (
            (0, 0, (1 - tx) * (1 - ty)),
            (0, 1, tx * (1 - ty)),
            (1, 0, (1 - tx) * ty),
            (1, 1, tx * ty),
        ):
            cx = x0i + dx
            cy = y0i + dy
            valid = (cx >= 0) & (cx < ww) & (cy >= 0) & (cy < hh)
            idx = jnp.clip(cy, 0, hh - 1) * ww + jnp.clip(cx, 0, ww - 1)
            cw = wt * w_l * valid.astype(jnp.float32)  # [B, Q, H, P]
            # fused: one-hot over K, weighted, reduced over P
            hit = (idx[..., None] == kio).astype(jnp.float32)
            wq = wq + jnp.einsum("bqhp,bqhpk->bqhk", cw, hit)

        wq = jnp.swapaxes(wq, 1, 2).reshape(b * h, q, kl)
        out = out + jnp.einsum(
            "nqk,nkd->nqd", wq, val_l, precision=jax.lax.Precision.HIGHEST
        )

    out = out.reshape(b, h, q, d)
    return jnp.swapaxes(out, 1, 2).reshape(b, q, h * d).astype(value.dtype)


@functools.partial(
    jax.jit, static_argnames=("spatial_shapes", "num_anchors", "window")
)
def ms_deform_attn_window(
    value: jnp.ndarray,  # [B, K, H, D]
    spatial_shapes: Tuple[Tuple[int, int], ...],
    anchors: jnp.ndarray,  # [B, Q, A, 2] normalized anchor points
    sampling_locations: jnp.ndarray,  # [B, Q, H, L, P, 2]
    attention_weights: jnp.ndarray,  # [B, Q, H, L, P]
    num_anchors: int,
    window: int = 12,
) -> jnp.ndarray:
    """Anchor-window formulation for large-K levels.

    All heads/points of a (query, z-anchor) sample near the shared anchor,
    so ONE window slice per (query, anchor) — gathered across all heads at
    once — replaces heads*points*4 corner slices (~32x fewer gather slices;
    TPU gathers are per-slice latency-bound). In-window sampling is a tiny
    fused one-hot over window^2 cells. Exact while every sampling point
    stays within the window around its anchor (points are clamped into it);
    sampling outside the image still yields exact zeros via edge padding.

    Point p belongs to anchor p // (P // num_anchors) (the z-anchor point
    distribution of `MSDeformableAttention3D`).

    The window buffer is the dominant allocation (q * A * window^2 * H*D);
    the query axis is chunked to bound it.
    """
    b, k, h, d = value.shape
    _, q, _, l, p, _ = sampling_locations.shape
    ws = window

    # chunk queries so the window buffer stays ~<=1.5 GB
    budget = int(1.5e9)
    per_q = b * num_anchors * ws * ws * h * d * value.dtype.itemsize
    qc = max(min(q, budget // max(per_q, 1)), 1)
    n_chunks = -(-q // qc)
    if n_chunks > 1:
        pad = n_chunks * qc - q
        loc_p = jnp.pad(
            sampling_locations, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0), (0, 0))
        )
        w_p = jnp.pad(attention_weights, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
        anc_p = jnp.pad(anchors, ((0, 0), (0, pad), (0, 0), (0, 0)))
        loc_c = loc_p.reshape((b, n_chunks, qc) + loc_p.shape[2:]).swapaxes(0, 1)
        w_c = w_p.reshape((b, n_chunks, qc) + w_p.shape[2:]).swapaxes(0, 1)
        anc_c = anc_p.reshape((b, n_chunks, qc) + anc_p.shape[2:]).swapaxes(0, 1)
        out = jax.lax.map(
            lambda t: ms_deform_attn_window(
                value, spatial_shapes, t[0], t[1], t[2], num_anchors, window
            ),
            (anc_c, loc_c, w_c),
        )  # [n_chunks, B, qc, H*D]
        out = out.swapaxes(0, 1).reshape(b, n_chunks * qc, h * d)
        return out[:, :q]

    a = num_anchors
    ppa = p // a
    starts, sizes, total = _level_bounds(spatial_shapes)
    assert total == k

    loc = sampling_locations.astype(jnp.float32)
    attw = attention_weights.astype(jnp.float32)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    out = jnp.zeros((b, q, h, d), jnp.float32)
    for lvl, (hh, wwl) in enumerate(spatial_shapes):
        val_l = jax.lax.dynamic_slice_in_dim(value, starts[lvl], sizes[lvl], 1)
        # [B, Hh, Ww, H*D], pad so any clamped window start is in bounds and
        # out-of-image cells are exact zeros; keep the value dtype — the
        # window buffer dominates memory/bandwidth
        img = val_l.reshape(b, hh, wwl, h * d)
        img = jnp.pad(img, ((0, 0), (ws, ws), (ws, ws), (0, 0)))

        # window origin per (query, anchor): centered on the anchor
        ax = anchors[..., 0].astype(jnp.float32) * wwl - 0.5  # [B, Q, A]
        ay = anchors[..., 1].astype(jnp.float32) * hh - 0.5
        ox = jnp.floor(ax).astype(jnp.int32) - ws // 2 + 1
        oy = jnp.floor(ay).astype(jnp.int32) - ws // 2 + 1
        # clamp into the padded map: valid starts [0, dim + ws]
        oxc = jnp.clip(ox + ws, 0, wwl + ws)
        oyc = jnp.clip(oy + ws, 0, hh + ws)

        win_starts = jnp.stack([oyc, oxc], -1).reshape(b, q * a, 2)
        windows = jax.vmap(
            lambda v, s: jax.lax.gather(
                v,
                s,
                dimension_numbers=dnums,
                slice_sizes=(ws, ws, h * d),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )
        )(img, win_starts)  # [B, Q*A, ws, ws, H*D]
        windows = windows.reshape(b, q, a, ws, ws, h, d)

        # in-window sampling: pixel coords relative to the window origin
        x = loc[:, :, :, lvl, :, 0] * wwl - 0.5  # [B, Q, H, P]
        y = loc[:, :, :, lvl, :, 1] * hh - 0.5
        # anchor index per point
        pa = jnp.arange(p) // ppa  # [P]
        ox_p = (oxc - ws)[:, :, None, :]  # [B, Q, 1, A] unpadded origin
        oy_p = (oyc - ws)[:, :, None, :]
        relx = x - jnp.take(ox_p, pa, axis=3).astype(jnp.float32)
        rely = y - jnp.take(oy_p, pa, axis=3).astype(jnp.float32)
        # clamp strictly inside the window (exact when already inside)
        eps = 1e-4
        relx = jnp.clip(relx, 0.0, ws - 1 - eps)
        rely = jnp.clip(rely, 0.0, ws - 1 - eps)
        x0 = jnp.floor(relx)
        y0 = jnp.floor(rely)
        tx = relx - x0
        ty = rely - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        # fused one-hot over the ws*ws window cells, corners folded
        cell = jnp.arange(ws * ws, dtype=jnp.int32)
        wq = jnp.zeros((b, q, h, p, ws * ws), jnp.float32)
        for dy, dx, wt in (
            (0, 0, (1 - tx) * (1 - ty)),
            (0, 1, tx * (1 - ty)),
            (1, 0, (1 - tx) * ty),
            (1, 1, tx * ty),
        ):
            idx = (y0i + dy) * ws + (x0i + dx)
            cw = wt * attw[:, :, :, lvl, :]
            wq = wq + cw[..., None] * (idx[..., None] == cell)
        # windows per point-anchor: select the anchor's window
        # [B, Q, A, ws*ws, H, D] x wq -> [B, Q, H, D]
        win_flat = windows.reshape(b, q, a, ws * ws, h, d)
        wq_a = wq.reshape(b, q, h, a, ppa, ws * ws)
        out_l = jnp.einsum(
            "bqhapc,bqachd->bqhd",
            wq_a,
            win_flat,
            precision=jax.lax.Precision.HIGHEST,
        )
        out = out + out_l

    return out.reshape(b, q, h * d).astype(value.dtype)


@functools.partial(
    jax.jit, static_argnames=("spatial_shape", "radius")
)
def ms_deform_attn_grid_shift(
    value: jnp.ndarray,  # [B, K, H, D], K == Hh*Ww
    spatial_shape: Tuple[int, int],
    sampling_locations: jnp.ndarray,  # [B, Q, H, 1, P, 2], Q == K
    attention_weights: jnp.ndarray,  # [B, Q, H, 1, P]
    radius: int = 8,
) -> jnp.ndarray:
    """Gather-free single-level path for grid-aligned queries (TSA).

    When every query sits on the value grid (BEV temporal self-attention:
    Q == bev_h*bev_w in row-major order) and sampling points stay within
    `radius` cells of the query's own cell, deformable attention equals a
    data-dependent local convolution: for each integer shift (sy, sx) the
    contribution is `mask_{sy,sx} * shift(value, (sy, sx))`, with the mask
    built by comparing each point's floored relative offset — no gathers.

    Points farther than `radius` are clamped to the window edge (the only
    deviation from exact semantics; trained offsets are initialized <= 4
    cells and stay small). Zero padding at the BEV border matches
    grid_sample zeros-padding exactly.
    """
    b, k, h, d = value.shape
    hh, ww = spatial_shape
    _, q, _, l, p, _ = sampling_locations.shape
    assert l == 1 and q == k == hh * ww, (l, q, k, hh, ww)
    r = radius

    loc = sampling_locations.astype(jnp.float32)
    attw = attention_weights.astype(jnp.float32)

    qx = (jnp.arange(q) % ww).astype(jnp.float32)
    qy = (jnp.arange(q) // ww).astype(jnp.float32)
    x = loc[:, :, :, 0, :, 0] * ww - 0.5  # [B, Q, H, P]
    y = loc[:, :, :, 0, :, 1] * hh - 0.5
    eps = 1e-4
    dx = jnp.clip(x - qx[None, :, None, None], -r, r - eps)
    dy = jnp.clip(y - qy[None, :, None, None], -r, r - eps)
    sx0 = jnp.floor(dx)
    sy0 = jnp.floor(dy)
    tx = dx - sx0
    ty = dy - sy0
    sx0 = sx0.astype(jnp.int32)  # in [-r, r-1]
    sy0 = sy0.astype(jnp.int32)

    # zero-padded value image [B, H, Hh+2r+2, Ww+2r+2, D]
    img = value.reshape(b, hh, ww, h, d).transpose(0, 3, 1, 2, 4)
    pad = r + 1
    img = jnp.pad(img, ((0, 0), (0, 0), (pad, pad), (pad, pad), (0, 0)))
    img = img.astype(jnp.float32)

    side = 2 * r + 2  # corner shifts span [-r, r+1]
    aw = attw[:, :, :, 0, :]  # [B, Q, H, P]
    w00 = aw * (1 - tx) * (1 - ty)
    w01 = aw * tx * (1 - ty)
    w10 = aw * (1 - tx) * ty
    w11 = aw * tx * ty

    def body(s, out):
        sy = s // side - r
        sx = s % side - r
        m = (
            w00 * ((sx0 == sx) & (sy0 == sy))
            + w01 * ((sx0 == sx - 1) & (sy0 == sy))
            + w10 * ((sx0 == sx) & (sy0 == sy - 1))
            + w11 * ((sx0 == sx - 1) & (sy0 == sy - 1))
        ).sum(-1)  # [B, Q, H]
        shifted = jax.lax.dynamic_slice(
            img,
            (0, 0, pad + sy, pad + sx, 0),
            (b, h, hh, ww, d),
        ).reshape(b, h, q, d)
        return out + jnp.swapaxes(m, 1, 2)[..., None] * shifted

    out = jax.lax.fori_loop(
        0, side * side, body, jnp.zeros((b, h, q, d), jnp.float32)
    )
    out = jnp.swapaxes(out, 1, 2).reshape(b, q, h * d)
    return out.astype(value.dtype)


@functools.partial(
    jax.jit, static_argnames=("spatial_shapes", "band_rows", "capacity_ratio")
)
def ms_deform_attn_banded(
    value: jnp.ndarray,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    *,
    band_rows: int = 4,
    capacity_ratio: float = 2.0,
) -> jnp.ndarray:
    """Row-banded MXU formulation (round-2 kernel prototype; see
    BENCH_NOTES.md "per-point banding"). Same semantics as
    `ms_deform_attn_jnp` provided no band overflows its capacity.

    Each (batch*head, query, point) item is routed to the row band
    containing floor(y) — its bilinear footprint is always rows
    {y0, y0+1}, so a one-row halo per band is exact for ARBITRARY
    learned offsets (per-query banding could not bound the spread).
    Routed items build a multi-hot row over the band's (band_rows+1)*W
    local keys and one batched einsum per level runs on the MXU with the
    band value blocks VMEM-resident, replacing the HBM gather stream.

    Items beyond a band's static capacity (`capacity_ratio` x the mean
    load) are dropped — callers must size the capacity for exactness,
    mirroring the SCA capacity routing contract.
    """
    b, k, h, d = value.shape
    _, q, _, l, p, _ = sampling_locations.shape
    starts, sizes, total = _level_bounds(spatial_shapes)
    assert total == k

    loc = sampling_locations.astype(jnp.float32)
    attw = attention_weights.astype(jnp.float32)
    val = jnp.swapaxes(value, 1, 2).reshape(b * h, k, d).astype(jnp.float32)
    bh = b * h
    n = q * p  # items per (batch*head, level)

    out = jnp.zeros((bh, q, d), jnp.float32)
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        hb = min(band_rows, hh)
        nb = -(-hh // hb)
        kb = (hb + 1) * ww  # band keys incl. one halo row
        cap = max(int(n / nb * capacity_ratio), 8)

        # band value blocks [bh, nb, kb, d]: pad rows to (nb+1)*hb so the
        # hb-shifted halo slice below stays in range (dynamic_slice clamps
        # out-of-range starts silently), contiguous reshape — no gather
        val_l = jax.lax.dynamic_slice_in_dim(val, starts[lvl], hh * ww, 1)
        pad_rows = (nb + 1) * hb - hh
        val_pad = jnp.pad(
            val_l.reshape(bh, hh, ww, d), ((0, 0), (0, pad_rows), (0, 0), (0, 0))
        )
        body = val_pad[:, : nb * hb].reshape(bh, nb, hb, ww, d)
        halo = jax.lax.dynamic_slice_in_dim(
            val_pad.reshape(bh, -1, d), hb * ww, nb * hb * ww, 1
        ).reshape(bh, nb, hb, ww, d)[:, :, :1]
        blocks = jnp.concatenate([body, halo], axis=2).reshape(bh, nb, kb, d)

        # per-item coords [bh, n]
        x = (loc[:, :, :, lvl, :, 0] * ww - 0.5).swapaxes(1, 2).reshape(bh, n)
        y = (loc[:, :, :, lvl, :, 1] * hh - 0.5).swapaxes(1, 2).reshape(bh, n)
        w_l = attw[:, :, :, lvl, :].swapaxes(1, 2).reshape(bh, n)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = x - x0
        ty = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        band = jnp.clip(y0i // hb, 0, nb - 1)  # [bh, n]

        # capacity routing: rank within band via running one-hot cumsum
        onehot_band = jax.nn.one_hot(band, nb, dtype=jnp.int32)  # [bh,n,nb]
        rank = jnp.cumsum(onehot_band, axis=1) - onehot_band  # pre-count
        rank = jnp.take_along_axis(rank, band[..., None], axis=2)[..., 0]
        keep = rank < cap
        slot = jnp.where(keep, band * cap + rank, nb * cap)  # drop -> pad slot

        # per-corner local key + weight for routed items
        lidx = jnp.zeros((bh, n, 4), jnp.int32)
        lw = jnp.zeros((bh, n, 4), jnp.float32)
        for ci, (dy, dx, wt) in enumerate((
            (0, 0, (1 - tx) * (1 - ty)),
            (0, 1, tx * (1 - ty)),
            (1, 0, (1 - tx) * ty),
            (1, 1, tx * ty),
        )):
            cx = x0i + dx
            cy = y0i + dy
            valid = (cx >= 0) & (cx < ww) & (cy >= 0) & (cy < hh)
            lrow = cy - band * hb
            valid = valid & (lrow >= 0) & (lrow <= hb)
            li = jnp.clip(lrow, 0, hb) * ww + jnp.clip(cx, 0, ww - 1)
            lidx = lidx.at[:, :, ci].set(li)
            lw = lw.at[:, :, ci].set(wt * w_l * valid.astype(jnp.float32))

        # scatter item payloads into [bh, nb*cap (+1 pad)] slot buffers
        slots = nb * cap
        qid_item = jnp.broadcast_to(
            (jnp.arange(n, dtype=jnp.int32) // p)[None, :], (bh, n)
        )
        slot_qid = jnp.zeros((bh, slots + 1), jnp.int32)
        slot_idx = jnp.zeros((bh, slots + 1, 4), jnp.int32)
        slot_w = jnp.zeros((bh, slots + 1, 4), jnp.float32)
        bi = jnp.arange(bh)[:, None]
        slot_qid = slot_qid.at[bi, slot].set(qid_item)
        slot_idx = slot_idx.at[bi, slot].set(lidx)
        slot_w = slot_w.at[bi, slot].set(lw)
        slot_qid = slot_qid[:, :slots].reshape(bh, nb, cap)
        slot_idx = slot_idx[:, :slots].reshape(bh, nb, cap, 4)
        slot_w = slot_w[:, :slots].reshape(bh, nb, cap, 4)

        # multi-hot rows over the band keys, 4 corners folded
        kio = jnp.arange(kb, dtype=jnp.int32)
        hit = (slot_idx[..., None] == kio).astype(jnp.float32)
        rows = jnp.einsum("bnsc,bnsck->bnsk", slot_w, hit)

        # the MXU step: band-local matmul, value block stays on-chip
        slot_out = jnp.einsum(
            "bnsk,bnkd->bnsd", rows, blocks,
            precision=jax.lax.Precision.HIGHEST,
        )  # [bh, nb, cap, d]

        # scatter-add back to queries (empty slots carry zero weight)
        out = out.at[bi, slot_qid.reshape(bh, slots)].add(
            slot_out.reshape(bh, slots, d)
        )

    out = out.reshape(b, h, q, d)
    return jnp.swapaxes(out, 1, 2).reshape(b, q, h * d).astype(value.dtype)


# per-level key-count threshold below which the MXU multi-hot path wins
# (measured on v5e: K=375 -> onehot 7.6ms vs patch 14.6ms; K=2500 ->
# onehot 8.2ms vs patch 3.7ms; crossover ~800)
ONEHOT_MAX_K = 800

# patch-gather materializes [items, 2, 2, D]; chunk the query axis so the
# peak stays bounded (~1 GB at fp32)
_PATCH_ITEM_BUDGET = 2_000_000


def _msda_patch_chunked(value, spatial_shapes, loc, attw):
    b, k, h, d = value.shape
    _, q, _, l, p, _ = loc.shape
    items = b * q * h * l * p
    if items <= _PATCH_ITEM_BUDGET:
        return ms_deform_attn_patch(value, spatial_shapes, loc, attw)
    n_chunks = -(-items // _PATCH_ITEM_BUDGET)
    qc = max(-(-q // n_chunks), 1)
    n_chunks = -(-q // qc)
    pad = n_chunks * qc - q
    loc_p = jnp.pad(loc, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0), (0, 0)))
    attw_p = jnp.pad(attw, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
    loc_c = loc_p.reshape((b, n_chunks, qc) + loc.shape[2:]).swapaxes(0, 1)
    attw_c = attw_p.reshape((b, n_chunks, qc) + attw.shape[2:]).swapaxes(0, 1)
    out = jax.lax.map(
        lambda lw: ms_deform_attn_patch(value, spatial_shapes, lw[0], lw[1]),
        (loc_c, attw_c),
    )  # [n_chunks, B, qc, H*D]
    out = out.swapaxes(0, 1).reshape(b, n_chunks * qc, h * d)
    return out[:, :q]


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    *,
    impl: str = "auto",
) -> jnp.ndarray:
    """Dispatching entry point used by the model modules.

    impl: 'auto' | 'jnp' | 'onehot' | 'patch'. 'auto' routes each level to
    its best XLA path (small K -> MXU multi-hot, large K -> chunked patch
    gather). The fused Pallas kernel (`msda_pallas.ms_deform_attn_pallas`)
    is opted into by the attention modules directly — it requires the
    caller to present items in a row-coherent order, which a generic
    dispatcher cannot assume.
    """
    spatial_shapes = tuple((int(a), int(b)) for a, b in spatial_shapes)
    if impl == "jnp":
        return ms_deform_attn_jnp(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    if impl == "onehot":
        return ms_deform_attn_onehot(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    if impl == "patch":
        return ms_deform_attn_patch(
            value, spatial_shapes, sampling_locations, attention_weights
        )

    # auto: route each level to its best implementation (small K -> MXU
    # multi-hot, large K -> chunked patch gather) and sum the outputs
    small = [i for i, (a, c) in enumerate(spatial_shapes) if a * c <= ONEHOT_MAX_K]
    large = [i for i in range(len(spatial_shapes)) if i not in small]

    def level_subset(idxs, fn):
        shapes_s = tuple(spatial_shapes[i] for i in idxs)
        starts, sizes, _ = _level_bounds(spatial_shapes)
        vals = jnp.concatenate(
            [
                jax.lax.dynamic_slice_in_dim(value, starts[i], sizes[i], 1)
                for i in idxs
            ],
            axis=1,
        )
        loc_s = sampling_locations[:, :, :, jnp.array(idxs)]
        w_s = attention_weights[:, :, :, jnp.array(idxs)]
        return fn(vals, shapes_s, loc_s, w_s)

    if not small:
        return _msda_patch_chunked(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    if not large:
        return ms_deform_attn_onehot(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    return level_subset(small, ms_deform_attn_onehot) + level_subset(
        large, _msda_patch_chunked
    )
