"""Fused Pallas TPU kernel for multi-scale deformable attention.

Replaces the reference's CUDA `ms_deform_attn_forward`
(`/root/reference/projects/mmdet3d_plugin/bevformer/modules/
multi_scale_deformable_attn_function.py:15-124`) on the hot encoder paths.

Why a kernel: TPUs have no fast arbitrary gather. The XLA formulations are
either latency-bound (patch gather: ~1.7 us/slice) or bandwidth-bound (the
pure-XLA banded prototype materializes the multi-hot rows tensor in HBM and
loses 2.6x). Round-2 decomposition benches added a second constraint: XLA
scatter on TPU costs ~100 ns per row, so ANY per-item scatter/permute
around the kernel (capacity-slot routing, scatter-add back) costs seconds
at base scale. This design has NO scatters:

  * Items — one (batch*head, query, point) sample each — are processed in
    CALLER order. The caller makes that order row-coherent (TSA/BEV queries
    are grid-ordered already; SCA sorts its per-camera items by projected
    anchor row ONCE per frame).
  * The value map of each level is pre-tiled once per frame
    (`prepare_window_values`) into OVERLAPPING row windows: window j holds
    image rows [j*stride, j*stride + stride + halo], transposed to
    [(rows)*D, WWp] so the kernel contracts over columns on the MXU.
  * For each 256-item tile, the window index is computed in XLA from the
    tile's sampled-row midrange and handed to the kernel via scalar
    prefetch (`PrefetchScalarGridSpec`) — the BlockSpec index_map reads it,
    so consecutive tiles reuse the VMEM-resident block (sorted order makes
    the index monotone).
  * The kernel builds the per-tile column-weight matrix `wcol[WWp, CT]`
    with two iota-compares in registers (factorized bilinear payload:
    column pair wx0/wx1 + row pair wy0/wy1, attention weight and
    grid_sample zero-padding validity folded in), contracts
    `V[(rows)*D, WWp] @ wcol` on the MXU, and combines the row chunks with
    runtime row compares against the window origin. Items whose sampled
    rows fall outside their tile's window contribute ZERO (same contract
    as grid_sample OOB) — `window_drop_mass` audits the lost weight, and
    callers size stride/halo so it is 0 in practice.
  * Output returns in item order: the caller reduces points per query with
    a dense reshape-sum. No scatter anywhere.

The backward pass is scatter-free Pallas too (`_backward`): dValue via
transposed window matmuls with VMEM revisit-accumulation per window block
plus an overlap fold, dAttw/dLoc via modified-payload kernel passes with
the cotangent dot reduced in-kernel. XLA's gather-vjp scatter costs ~1.7
us/row on TPU — seconds per encoder layer at base scale. All kernel
boundary arrays use FLAT layouts ([b, q, h*l*p*(2)]): 6D arrays with tiny
minor dims pick up tile-padded layouts in backward copies (measured 32x,
the base train OOM).

Validated against `msda.ms_deform_attn_jnp` (incl. out-of-bounds sampling
locations) in tests/test_msda.py::test_windowed_pallas_* via interpret
mode, and on-device by tools/bench_msda_kernel.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bevformer_tpu.kernels.msda import _level_bounds

LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _n_windows(hh: int, stride: int) -> int:
    return max(-(-hh // stride), 1)


def prepare_window_values(
    value: jnp.ndarray,  # [B, K, H, D]
    spatial_shapes: Tuple[Tuple[int, int], ...],
    *,
    stride: int = 8,
    halo: int = 8,
    compute_dtype=jnp.float32,
):
    """Pre-tile the value maps into per-level overlapping row-window blocks.

    Returns a list of [B*H, nw, (stride+halo+1)*D, WWp] arrays; window j
    holds rows [j*stride, j*stride + stride + halo] (zero-padded past the
    image). ~(1 + (halo+1)/stride)x the value bytes; hoist out of loops
    whose value is loop-invariant (the 6 encoder layers share one set of
    camera features)."""
    b, k, h, d = value.shape
    bh = b * h
    starts, sizes, total = _level_bounds(spatial_shapes)
    assert total == k
    val = jnp.swapaxes(value, 1, 2).reshape(bh, k, d)

    wrows = stride + halo + 1
    out = []
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        nw = _n_windows(hh, stride)
        wwp = _round_up(ww, LANE)
        img = jax.lax.dynamic_slice_in_dim(val, starts[lvl], hh * ww, 1)
        img = img.reshape(bh, hh, ww, d)
        img = jnp.pad(
            img,
            ((0, 0), (0, (nw - 1) * stride + wrows - hh), (0, wwp - ww), (0, 0)),
        )
        # overlapping windows: stack `wrows` stride-shifted row slices
        wins = jnp.stack(
            [img[:, j * stride : j * stride + wrows] for j in range(nw)],
            axis=1,
        )  # [bh, nw, wrows, wwp, d]
        wins = wins.transpose(0, 1, 2, 4, 3).reshape(bh, nw, wrows * d, wwp)
        out.append(wins.astype(compute_dtype))
    return out


def _level_accum(pay, val, j, wrows, d, stride, compute_dtype, acc):
    """Accumulate one level's contribution for a tile into acc [d, ct]."""
    x0 = pay[0:1]
    wx0 = pay[1:2]
    wx1 = pay[2:3]
    y0 = pay[3:4]
    wy0 = pay[4:5]
    wy1 = pay[5:6]

    wwp = val.shape[-1]
    ct = pay.shape[-1]

    cio = jax.lax.broadcasted_iota(jnp.int32, (wwp, ct), 0)  # int: tpu.iota
    xi = x0.astype(jnp.int32)
    wcol = jnp.where(cio == xi, wx0, 0.0) + jnp.where(cio == xi + 1, wx1, 0.0)

    # f32 mode must ask for HIGHEST or the MXU silently truncates the
    # operands to bf16 (measured 3e-3 rel err on v5e)
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    tmat = jnp.dot(
        val.astype(compute_dtype),
        wcol.astype(compute_dtype),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # [wrows*D, CT]

    # combine rows: global row of window-chunk r is j*stride + r; items
    # whose y0 misses every chunk contribute zero (out-of-window drop)
    base = (j * stride).astype(jnp.float32)
    for r in range(wrows):
        fr = base + float(r)
        wr = jnp.where(y0 == fr, wy0, 0.0) + jnp.where(y0 == fr - 1.0, wy1, 0.0)
        acc = acc + wr * tmat[r * d : (r + 1) * d]
    return acc


def _kernel(wrows: int, d: int, stride: int, n_levels: int, tiles: int,
            ct: int, p: int, slotw: int, compute_dtype,
            jrow_ref, pay_ref, *refs):
    """One (batch*head, item-supertile) step: ALL levels fused and `tiles`
    item-tiles per step — the out block is written once per supertile and
    the fixed per-step cost (index maps, DMA bookkeeping) is amortised
    over tiles*levels matmuls. The per-query POINT-SUM happens in-kernel
    via a tiny iota-built 0/1 matmul (a host-side lane-strided reduce
    measured +44 ms at base SCA scale), so the out block is per-QUERY:
    [1, D, tiles*slotw] with each tile's ct/p query sums in a slotw-lane
    slot (slotw = max(ct/p, 128) — Mosaic's lane minimum).

    jrow_ref: scalar-prefetch [L, bh, nt] window index per (level, tile).
    pay_ref:  [1, L, 8, tiles*CT] — per level, channels (x0, wx0, wx1,
              y0, wy0, wy1, 0, 0); indices as exact integers, y0 GLOBAL
              image row.
    refs: L*tiles window-block refs [1, 1, wrows*D, WWp_l] ordered
          (level-major, sub-tile minor), then the out_ref.
    """
    i = pl.program_id(0)
    t = pl.program_id(1)
    val_refs = refs[: n_levels * tiles]
    out_ref = refs[n_levels * tiles]
    ctq = ct // p

    for s in range(tiles):
        acc = jnp.zeros((d, ct), jnp.float32)
        for lvl in range(n_levels):
            acc = _level_accum(
                pay_ref[0, lvl, :, s * ct : (s + 1) * ct],
                val_refs[lvl * tiles + s][0, 0],
                jrow_ref[lvl, i, t * tiles + s],
                wrows, d, stride, compute_dtype, acc,
            )
        if p == 1 and slotw == ct:
            out_ref[0, :, s * slotw : (s + 1) * slotw] = acc.astype(
                out_ref.dtype
            )
        else:
            rio = jax.lax.broadcasted_iota(jnp.int32, (ct, slotw), 0)
            cio2 = jax.lax.broadcasted_iota(jnp.int32, (ct, slotw), 1)
            e2 = jnp.where(rio // p == cio2, 1.0, 0.0)  # cols>=ctq never hit
            acc_q = jnp.dot(
                acc, e2, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [d, slotw]
            out_ref[0, :, s * slotw : (s + 1) * slotw] = acc_q.astype(
                out_ref.dtype
            )


def _payload_level(loc_l, attw_l, hh, ww):
    """Factorized bilinear payload for one level.

    loc_l [bh, n, 2] normalized, attw_l [bh, n] ->
    (payload [bh, 8, n] f32, y0i [bh, n] int32)."""
    x = loc_l[..., 0] * ww - 0.5
    y = loc_l[..., 1] * hh - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    vx0 = (x0i >= 0) & (x0i < ww)
    vx1 = (x0i >= -1) & (x0i < ww - 1)
    vy0 = (y0i >= 0) & (y0i < hh)
    vy1 = (y0i >= -1) & (y0i < hh - 1)

    # clip to -1 so corner1's index (x0+1) stays exact when corner0 is out
    # of range on the left; out-of-range corners carry weight 0
    x0c = jnp.clip(x0i, -1, ww - 1).astype(jnp.float32)
    aw = attw_l
    payload = jnp.stack(
        [
            x0c,
            aw * (1.0 - tx) * vx0,
            aw * tx * vx1,
            y0,
            (1.0 - ty) * vy0,
            ty * vy1,
            jnp.zeros_like(aw),
            jnp.zeros_like(aw),
        ],
        axis=1,
    )  # [bh, 8, n]
    return payload, y0i


def _payload_level_bwd(loc_l, attw_l, hh, ww):
    """Backward payload: forward channels UNFOLDED (attw separate) plus the
    corner validity masks needed for the dLoc passes.

    Channels: 0 x0c, 1 wx0n=(1-tx)vx0, 2 wx1n=tx*vx1, 3 y0, 4 wy0, 5 wy1,
    6 vy0, 7 vy1, 8 attw, 9 vx0, 10 vx1 (padded to 16 sublanes)."""
    x = loc_l[..., 0] * ww - 0.5
    y = loc_l[..., 1] * hh - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    vx0 = ((x0i >= 0) & (x0i < ww)).astype(jnp.float32)
    vx1 = ((x0i >= -1) & (x0i < ww - 1)).astype(jnp.float32)
    vy0 = ((y0i >= 0) & (y0i < hh)).astype(jnp.float32)
    vy1 = ((y0i >= -1) & (y0i < hh - 1)).astype(jnp.float32)
    x0c = jnp.clip(x0i, -1, ww - 1).astype(jnp.float32)
    z = jnp.zeros_like(tx)
    payload = jnp.stack(
        [
            x0c,
            (1.0 - tx) * vx0,
            tx * vx1,
            y0,
            (1.0 - ty) * vy0,
            ty * vy1,
            vy0,
            vy1,
            attw_l,
            vx0,
            vx1,
            z, z, z, z, z,
        ],
        axis=1,
    )  # [bh, 16, n]
    return payload, y0i


def _rowcomb(tm, w0, w1, y0, base, wrows, d):
    """Row combine: acc[d, ct] = sum_r sel_r(y0; w0, w1) * tm[r*d:(r+1)*d]."""
    acc = jnp.zeros((d, tm.shape[-1]), jnp.float32)
    for r in range(wrows):
        fr = base + float(r)
        wr = jnp.where(y0 == fr, w0, 0.0) + jnp.where(y0 == fr - 1.0, w1, 0.0)
        acc = acc + wr * tm[r * d : (r + 1) * d]
    return acc


def _expand_g(g_ref, p, ct, ctq):
    """[d, >=ct/p] per-query cotangents -> [d, ct] per-item (q-major,
    p-minor interleave) via a tiny iota-built 0/1 matmul — the MXU does
    the interleave Mosaic has no lane-shuffle for. The block may carry
    128-lane padding when ct/p < 128 (Mosaic minimum)."""
    gq = g_ref[0]  # [d, gw] f32
    if p == 1:
        return gq
    gw = gq.shape[-1]
    src = jax.lax.broadcasted_iota(jnp.int32, (gw, ct), 0)
    dst = jax.lax.broadcasted_iota(jnp.int32, (gw, ct), 1)
    # rows >= ctq are per-tile lane padding: never selected
    e = jnp.where(src == dst // p, 1.0, 0.0)
    return jnp.dot(
        gq, e, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _bwd_aux_kernel(wrows, d, stride, n_levels, p, ctq, compute_dtype,
                    jrow_ref, pay_ref, g_ref, *refs):
    """Per (bh, tile): dAttw and dLoc ingredients, g-dot reduced IN-kernel.

    pay_ref: [1, L, 16, CT] backward payload. g_ref: [1, d, CT/p]
    per-query cotangents (expanded to items in-kernel). refs: L
    window-block refs then out_ref [1, L, 8, CT] with channels (dattw,
    dlocy_raw, dlocx_raw) — *_raw lack the hh/ww scale, applied by the
    caller; the attw factor of dLoc is folded in here."""
    i = pl.program_id(0)
    t = pl.program_id(1)
    val_refs = refs[:n_levels]
    out_ref = refs[n_levels]
    ct = pay_ref.shape[-1]
    g = _expand_g(g_ref, p, ct, ctq)  # [d, ct] f32
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    for lvl in range(n_levels):
        pay = pay_ref[0, lvl].astype(jnp.float32)
        x0 = pay[0:1]
        wx0n = pay[1:2]
        wx1n = pay[2:3]
        y0 = pay[3:4]
        wy0 = pay[4:5]
        wy1 = pay[5:6]
        vy0 = pay[6:7]
        vy1 = pay[7:8]
        attw = pay[8:9]
        vx0 = pay[9:10]
        vx1 = pay[10:11]
        val = val_refs[lvl][0, 0]
        wwp = val.shape[-1]
        cio = jax.lax.broadcasted_iota(jnp.int32, (wwp, ct), 0)
        xi = x0.astype(jnp.int32)
        wcol = jnp.where(cio == xi, wx0n, 0.0) + jnp.where(
            cio == xi + 1, wx1n, 0.0
        )
        tm = jnp.dot(
            val.astype(compute_dtype), wcol.astype(compute_dtype),
            preferred_element_type=jnp.float32, precision=precision,
        )
        wcol_dx = jnp.where(cio == xi, -vx0, 0.0) + jnp.where(
            cio == xi + 1, vx1, 0.0
        )
        tm_dx = jnp.dot(
            val.astype(compute_dtype), wcol_dx.astype(compute_dtype),
            preferred_element_type=jnp.float32, precision=precision,
        )
        base = (jrow_ref[lvl, i, t] * stride).astype(jnp.float32)
        s_plain = _rowcomb(tm, wy0, wy1, y0, base, wrows, d)
        dy_o = _rowcomb(tm, -vy0, vy1, y0, base, wrows, d)
        dx_o = _rowcomb(tm_dx, wy0, wy1, y0, base, wrows, d)
        dattw = (g * s_plain).sum(axis=0, keepdims=True)
        dlocy = attw * (g * dy_o).sum(axis=0, keepdims=True)
        dlocx = attw * (g * dx_o).sum(axis=0, keepdims=True)
        out_ref[0, lvl, 0:1, :] = dattw.astype(out_ref.dtype)
        out_ref[0, lvl, 1:2, :] = dlocy.astype(out_ref.dtype)
        out_ref[0, lvl, 2:3, :] = dlocx.astype(out_ref.dtype)


def _bwd_dval_kernel(wrows, d, stride, n_levels, p, ctq, compute_dtype,
                     jrow_ref, pay_ref, g_ref, *out_refs):
    """Per (bh, tile): accumulate dValue window-gradient blocks.

    Tiles sharing a window index (jrow is monotone for row-coherent item
    orders) accumulate into the SAME VMEM-resident out block; a fresh
    window starts with an overwrite. Windows no tile maps to are left
    UNDEFINED — the caller masks them by visited-ness."""
    i = pl.program_id(0)
    t = pl.program_id(1)
    ct = pay_ref.shape[-1]
    g = _expand_g(g_ref, p, ct, ctq)  # [d, ct] f32
    for lvl in range(n_levels):
        pay = pay_ref[0, lvl].astype(jnp.float32)
        x0 = pay[0:1]
        wx0n = pay[1:2]
        wx1n = pay[2:3]
        y0 = pay[3:4]
        wy0 = pay[4:5]
        wy1 = pay[5:6]
        attw = pay[8:9]
        out_ref = out_refs[lvl]
        wwp = out_ref.shape[-1]
        cio = jax.lax.broadcasted_iota(jnp.int32, (wwp, ct), 0)
        xi = x0.astype(jnp.int32)
        wcol = jnp.where(cio == xi, wx0n, 0.0) + jnp.where(
            cio == xi + 1, wx1n, 0.0
        )
        j = jrow_ref[lvl, i, t]
        base = (j * stride).astype(jnp.float32)
        # A[r*d+ch, item] = attw * rowsel_r(y0) * g[ch, item]
        rows = []
        for r in range(wrows):
            fr = base + float(r)
            wr = attw * (
                jnp.where(y0 == fr, wy0, 0.0)
                + jnp.where(y0 == fr - 1.0, wy1, 0.0)
            )
            rows.append(wr * g)
        a = jnp.concatenate(rows, axis=0)  # [wrows*d, ct]
        contrib = jax.lax.dot_general(
            a.astype(compute_dtype),
            wcol.astype(compute_dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(
                jax.lax.Precision.HIGHEST
                if compute_dtype == jnp.float32
                else jax.lax.Precision.DEFAULT
            ),
        )  # [wrows*d, wwp]
        jprev = jrow_ref[lvl, i, jnp.maximum(t - 1, 0)]
        first = jnp.logical_or(t == 0, j != jprev)

        @pl.when(first)
        def _():
            out_ref[0, 0] = contrib.astype(out_ref.dtype)

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[0, 0] = out_ref[0, 0] + contrib.astype(out_ref.dtype)


def _fold_windows(dwin, hh, ww, d, stride, wrows):
    """Inverse of prepare_window_values: sum overlapping row-window grads
    back into image layout. dwin [bh, nw, wrows*d, wwp] -> [bh, hh*ww, d]."""
    bh, nw, rm, wwp = dwin.shape
    assert rm == wrows * d
    dwin = dwin.reshape(bh, nw, wrows, d, wwp)
    hpad = (nw - 1) * stride + wrows
    img = jnp.zeros((bh, hpad, d, wwp), jnp.float32)
    for r in range(wrows):
        img = img.at[:, r : r + (nw - 1) * stride + 1 : stride].add(
            dwin[:, :, r].astype(jnp.float32)
        )
    img = img[:, :hh, :, :ww]
    return img.transpose(0, 1, 3, 2).reshape(bh, hh * ww, d)


def _tile_windows(y0i, nt, ct, stride, wrows, nw, segments=1, y0i_hi=None):
    """Per-tile window index. The window [j*stride, j*stride + wrows - 1]
    must cover rows [lo, hi+1] (both bilinear corners of every item); when
    the tile's spread fits, clamp the centered choice into the covering
    range so the drop mass is exactly zero.

    `y0i_hi`: optional separate array for the hi (max) side. Callers that
    know some items contribute ZERO output regardless of window (fully
    out-of-image rows: bilinear row masks kill both corners) pass
    lo-masked y0 (+big at those items) here as `y0i` and hi-masked (-big)
    as `y0i_hi`, so dead items never drag the window away from live ones
    (SCA capacity routing fills spare slots with invisible queries whose
    projections are arbitrary — measured 0.8% mass loss on border tiles
    without the masking).

    The sequence is made MONOTONE non-decreasing along tiles (cumulative
    max): the backward dValue kernel accumulates tiles sharing a window
    into one VMEM block and treats a window *change* as a fresh block, so
    a revisited window after an intervening different one (possible when
    learned offsets de-sort the sampled rows) would silently overwrite
    earlier gradient contributions. With cummax, revisits are impossible;
    any coverage the constraint costs (j forced past a later tile's jmax)
    is charged to the same out-of-window drop the forward applies, and is
    visible to `window_drop_mass` (which shares this function)."""
    y0t = y0i.reshape(y0i.shape[0], nt, ct)
    lo = y0t.min(-1)
    hi = (y0i if y0i_hi is None else y0i_hi).reshape(
        y0i.shape[0], nt, ct
    ).max(-1)
    center = (lo + hi + 1 - wrows) // 2  # ideal window start row
    j_ideal = (center + stride // 2) // stride
    jmin = -((wrows - 2 - hi) // stride)  # ceil((hi+2-wrows)/stride)
    jmax = jnp.floor_divide(lo, stride)
    j = jnp.clip(jnp.clip(j_ideal, jmin, jmax), 0, nw - 1)
    # all-dead tile (every item lo/hi-masked => lo > hi): any window works;
    # 0 stays neutral under the cummax below (mid-stream dead tiles
    # inherit the previous live window)
    j = jnp.where(lo > hi, 0, j)
    # monotone per SEGMENT: the heads-inner kernel concatenates
    # independent point streams along the tile axis — row order (and
    # hence j) restarts at each stream boundary, so the cummax must too
    bsz = j.shape[0]
    j = jax.lax.cummax(
        j.reshape(bsz, segments, nt // segments), axis=2
    ).reshape(bsz, nt)
    return j.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "spatial_shapes",
        "heads",
        "points",
        "stride",
        "halo",
        "cap_tile",
        "tiles",
        "compute_dtype",
        "interpret",
    ),
)
def _forward(
    value,
    spatial_shapes,
    sampling_locations,
    attention_weights,
    window_values=None,
    *,
    heads=None,
    points=None,
    stride=8,
    halo=8,
    cap_tile=256,
    tiles=2,
    compute_dtype=jnp.float32,
    interpret=False,
):
    """Items ([b, q, h, l, p] flattened to (q, p) per batch*head) must be
    row-coherent within each `cap_tile` chunk for lossless sampling; see
    module docstring.

    Accepts either the 6D [b, q, h, l, p, 2] loc layout or the FLAT
    [b, q, h*l*p*2] layout (+ heads/points statics, value [b, k, h*d]).
    Production callers pass flats: 6D arrays crossing a jit/custom_vjp
    boundary get tile-padded layouts (a [..,4,2]-minor f32 cotangent copy
    measured 32x expansion — the base train OOM)."""
    if sampling_locations.ndim == 6:
        heads = sampling_locations.shape[2]
        points = sampling_locations.shape[4]
        b0, q0 = sampling_locations.shape[:2]
        sampling_locations = sampling_locations.reshape(b0, q0, -1)
        attention_weights = attention_weights.reshape(b0, q0, -1)
    if value.ndim == 4:
        value = value.reshape(value.shape[0], value.shape[1], -1)
    b, k, hd = value.shape
    h, p = heads, points
    d = hd // h
    q = sampling_locations.shape[1]
    l = len(spatial_shapes)
    bh, n = b * h, q * p
    ct = cap_tile
    n_pad = _round_up(n, ct)
    nt = n_pad // ct
    wrows = stride + halo + 1

    if window_values is None:
        window_values = prepare_window_values(
            value.reshape(b, k, h, d), spatial_shapes, stride=stride,
            halo=halo, compute_dtype=compute_dtype,
        )

    # [b, q, h*l*p*2] -> [bh, n, l, *] (the 6D view lives only inside this
    # fusion region, never at a program boundary)
    loc = (
        sampling_locations.astype(jnp.float32)
        .reshape(b, q, h, l, p, 2)
        .transpose(0, 2, 1, 4, 3, 5)
        .reshape(bh, n, l, 2)
    )
    attw = (
        attention_weights.astype(jnp.float32)
        .reshape(b, q, h, l, p)
        .transpose(0, 2, 1, 4, 3)
        .reshape(bh, n, l)
    )
    if n_pad != n:
        # edge-pad so trailing fake items share the last tile's rows
        loc = jnp.pad(loc, ((0, 0), (0, n_pad - n), (0, 0), (0, 0)),
                      mode="edge")
        attw = jnp.pad(attw, ((0, 0), (0, n_pad - n), (0, 0)))

    # ONE pallas_call over all levels and `tiles` item-tiles per grid
    # step: each supertile's out block accumulates every level in VMEM
    # and is written once, and the fixed per-step cost is amortised over
    # tiles*levels matmuls (4 separate level calls at 1 tile/step:
    # 86 ms at base SCA scale; fused levels: 75; +2 tiles/step: measured
    # below). Window coverage per 512-item tile is unchanged.
    rm = wrows * d
    n_sup = _round_up(n_pad, tiles * ct)
    if n_sup != n_pad:
        loc = jnp.pad(loc, ((0, 0), (0, n_sup - n_pad), (0, 0), (0, 0)),
                      mode="edge")
        attw = jnp.pad(attw, ((0, 0), (0, n_sup - n_pad), (0, 0)))
        n_pad = n_sup
        nt = n_pad // ct
    nt2 = nt // tiles
    payloads = []
    jrows = []
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        nw = _n_windows(hh, stride)
        wwp = _round_up(ww, LANE)
        vb = window_values[lvl]
        assert vb.shape == (bh, nw, rm, wwp), (vb.shape, (bh, nw, rm, wwp))
        payload, y0i = _payload_level(loc[:, :, lvl], attw[:, :, lvl], hh, ww)
        payloads.append(payload)
        jrows.append(_tile_windows(y0i, nt, ct, stride, wrows, nw))
    jrow = jnp.stack(jrows, axis=0)  # [L, bh, nt]
    pay = jnp.stack(payloads, axis=1)  # [bh, L, 8, n_pad]

    assert ct % p == 0, (ct, p)
    slotw = max(ct // p, LANE)

    def _val_spec(lvl, s, wwp):
        return pl.BlockSpec(
            (1, 1, rm, wwp),
            lambda i, t, jr: (i, jr[lvl, i, t * tiles + s], 0, 0),
        )

    nl = len(spatial_shapes)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, nt2),
        in_specs=[
            pl.BlockSpec(
                (1, nl, 8, tiles * ct), lambda i, t, jr: (i, 0, 0, t)
            )
        ]
        + [
            _val_spec(lvl, s, _round_up(ww, LANE))
            for lvl, (hh, ww) in enumerate(spatial_shapes)
            for s in range(tiles)
        ],
        out_specs=pl.BlockSpec(
            (1, d, tiles * slotw), lambda i, t, jr: (i, 0, t)
        ),
    )
    vals = [
        window_values[lvl]
        for lvl in range(nl)
        for _ in range(tiles)
    ]
    out = pl.pallas_call(
        functools.partial(
            _kernel, wrows, d, stride, nl, tiles, ct, p, slotw,
            compute_dtype,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, d, nt * slotw), compute_dtype),
        interpret=interpret,
    )(jrow, pay, *vals)

    # un-slot (tiles wrote ct/p query sums per slotw-lane slot), crop the
    # query padding, restore [B, Q, H*D] with one clean-minor transpose
    ctq = ct // p
    if slotw != ctq:
        out = out.reshape(bh, d, nt, slotw)[:, :, :, :ctq].reshape(
            bh, d, nt * ctq
        )
    out = out[:, :, :q]
    out = out.reshape(b, h * d, q).swapaxes(1, 2)  # [b, q, h*d]
    return out.astype(value.dtype)


def window_drop_mass(
    spatial_shapes, sampling_locations, attention_weights, *,
    stride=8, halo=8, cap_tile=256,
):
    """Audit: per-level total attention weight lost to out-of-window items
    (0.0 = the kernel is exact vs the oracle for this input order).
    Host-side wrapper (python floats); use `window_drop_mass_in_graph`
    inside jit (the production audit path)."""
    dm = window_drop_mass_in_graph(
        spatial_shapes, sampling_locations, attention_weights,
        stride=stride, halo=halo, cap_tile=cap_tile,
    )
    return [float(v) for v in dm]


def window_drop_mass_in_graph(
    spatial_shapes, sampling_locations, attention_weights, *,
    stride=8, halo=8, cap_tile=256,
):
    """In-graph drop-mass audit: returns a [n_levels] jnp array of lost
    attention mass. Traces the same `_tile_windows` the kernel uses, so it
    reports exactly what the fused forward drops for this input order."""
    b, q, h, l, p, _ = sampling_locations.shape
    bh, n = b * h, q * p
    ct = cap_tile
    n_pad = _round_up(n, ct)
    nt = n_pad // ct
    wrows = stride + halo + 1
    loc = (
        sampling_locations.astype(jnp.float32)
        .transpose(0, 2, 1, 4, 3, 5)
        .reshape(bh, n, l, 2)
    )
    attw = (
        attention_weights.astype(jnp.float32)
        .transpose(0, 2, 1, 4, 3)
        .reshape(bh, n, l)
    )
    if n_pad != n:
        loc = jnp.pad(loc, ((0, 0), (0, n_pad - n), (0, 0), (0, 0)),
                      mode="edge")
        attw = jnp.pad(attw, ((0, 0), (0, n_pad - n), (0, 0)))
    dropped = []
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        nw = _n_windows(hh, stride)
        y = loc[:, :, lvl, 1] * hh - 0.5
        y0 = jnp.floor(y)
        ty = y - y0
        y0i = y0.astype(jnp.int32)
        jrow = _tile_windows(y0i, nt, ct, stride, wrows, nw)
        base = jnp.repeat(jrow * stride, ct, axis=1)
        # exact lost bilinear mass: each corner row must itself be inside
        # the window AND the image to contribute
        wy0 = (1.0 - ty) * ((y0i >= 0) & (y0i < hh))
        wy1 = ty * ((y0i >= -1) & (y0i < hh - 1))
        out0 = (y0i < base) | (y0i > base + wrows - 1)
        out1 = (y0i + 1 < base) | (y0i + 1 > base + wrows - 1)
        lost = attw[:, :, lvl] * (wy0 * out0 + wy1 * out1)
        dropped.append(lost.sum())
    return jnp.stack(dropped)


def resolve_impl(mode: str) -> str:
    """Resolve a config `fused_msda` mode to an execution mode.

    'auto' -> 'bf16' on a real TPU backend, 'off' elsewhere (CPU tests and
    goldens keep the exact XLA paths). 'off' | 'fp32' | 'bf16' pass
    through. fp32 mode is exact (HIGHEST-precision MXU passes) but ~2x the
    kernel cost of bf16."""
    if mode == "auto":
        try:
            platform = jax.devices()[0].platform
        except Exception:  # pragma: no cover
            return "off"
        return "bf16" if platform == "tpu" else "off"
    assert mode in ("off", "fp32", "bf16"), mode
    return mode


def supported(value, spatial_shapes, sampling_locations) -> bool:
    """The fused kernel serves any static shape with head_dim % 8 == 0 on a
    real TPU backend (Mosaic). CPU tests exercise it via interpret mode."""
    d = value.shape[-1]
    if d % 8 != 0:
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no backend at all
        return False
    return platform == "tpu"


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(1, 4, 5, 6, 7, 8, 9, 10)
)
def _pallas_vjp(
    value,
    spatial_shapes,
    sampling_locations,
    attention_weights,
    heads,
    points,
    stride,
    halo,
    cap_tile,
    compute_dtype,
    interpret,
):
    # FLAT layouts only: value [b, k, h*d], loc [b, q, h*l*p*2], attw
    # [b, q, h*l*p] — see _forward's docstring for why
    return _forward(
        value,
        spatial_shapes,
        sampling_locations,
        attention_weights,
        heads=heads,
        points=points,
        stride=stride,
        halo=halo,
        cap_tile=cap_tile,
        compute_dtype=compute_dtype,
        interpret=interpret,
    )


def _fwd(value, spatial_shapes, loc, attw, heads, points, stride, halo,
         cap_tile, compute_dtype, interpret):
    out = _forward(
        value, spatial_shapes, loc, attw,
        heads=heads, points=points,
        stride=stride, halo=halo, cap_tile=cap_tile,
        compute_dtype=compute_dtype, interpret=interpret,
    )
    return out, (value, loc, attw)


@functools.partial(
    jax.jit,
    static_argnames=(
        "spatial_shapes", "heads", "points", "stride", "halo", "cap_tile",
        "compute_dtype", "interpret",
    ),
)
def _backward(
    value, spatial_shapes, sampling_locations, attention_weights, g, *,
    heads=None, points=None, stride, halo, cap_tile, compute_dtype,
    interpret,
):
    """Scatter-free Pallas backward (XLA's scatter costs ~1.7 us/row on
    TPU — seconds per layer at base scale; measured tiny encoder-only
    backward 7.7-19.5 s with XLA scatter paths).

      dValue: transposed window matmuls accumulated per window block
              (tiles sharing a window revisit the same VMEM block), then
              an overlap fold back to image layout.
      dAttw/dLoc: modified-payload forward passes (attw unfolded; column/
              row weight derivative variants) dotted with the cotangent
              in-kernel.
    """
    if sampling_locations.ndim == 6:
        heads = sampling_locations.shape[2]
        points = sampling_locations.shape[4]
        b0, q0 = sampling_locations.shape[:2]
        sampling_locations = sampling_locations.reshape(b0, q0, -1)
        attention_weights = attention_weights.reshape(b0, q0, -1)
    if value.ndim == 4:
        value = value.reshape(value.shape[0], value.shape[1], -1)
    b, k, hd = value.shape
    h, p = heads, points
    d = hd // h
    q = sampling_locations.shape[1]
    l = len(spatial_shapes)
    bh, n = b * h, q * p
    ct = cap_tile
    assert ct % p == 0, (ct, p)
    n_pad = _round_up(n, ct)
    q_pad = n_pad // p  # each ct-item tile covers ct/p contiguous queries
    nt = n_pad // ct
    wrows = stride + halo + 1

    window_values = prepare_window_values(
        value.reshape(b, k, h, d), spatial_shapes, stride=stride,
        halo=halo, compute_dtype=compute_dtype,
    )

    loc = (
        sampling_locations.astype(jnp.float32)
        .reshape(b, q, h, l, p, 2)
        .transpose(0, 2, 1, 4, 3, 5)
        .reshape(bh, n, l, 2)
    )
    attw = (
        attention_weights.astype(jnp.float32)
        .reshape(b, q, h, l, p)
        .transpose(0, 2, 1, 4, 3)
        .reshape(bh, n, l)
    )
    if n_pad != n:
        loc = jnp.pad(loc, ((0, 0), (0, n_pad - n), (0, 0), (0, 0)),
                      mode="edge")
        attw = jnp.pad(attw, ((0, 0), (0, n_pad - n), (0, 0)))

    # PER-QUERY cotangents [bh, d, q_pad] — the kernels expand them to
    # items with a tiny iota-built 0/1 matmul per tile (a host-side
    # q-major interleave needs a [bh, d, q, p] broadcast that picks up a
    # 2.7x padded layout: 1.95 GB at base scale). Padded queries get ZERO.
    g_r = (
        g.astype(jnp.float32)
        .reshape(b, q, h, d)
        .transpose(0, 2, 3, 1)
        .reshape(bh, d, q)
    )
    if q_pad != q:
        g_r = jnp.pad(g_r, ((0, 0), (0, 0), (0, q_pad - q)))
    # Mosaic needs >=128-lane blocks: when a tile's query chunk ct/p is
    # narrower, pad each chunk to a 128-lane slot
    ctq = ct // p
    gw = max(ctq, LANE)
    nt_blocks = q_pad // ctq
    if ctq < LANE:
        g_r = jnp.pad(
            g_r.reshape(bh, d, nt_blocks, ctq),
            ((0, 0), (0, 0), (0, 0), (0, LANE - ctq)),
        ).reshape(bh, d, nt_blocks * LANE)

    payloads = []
    jrows = []
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        nw = _n_windows(hh, stride)
        payload, y0i = _payload_level_bwd(
            loc[:, :, lvl], attw[:, :, lvl], hh, ww
        )
        payloads.append(payload)
        jrows.append(_tile_windows(y0i, nt, ct, stride, wrows, nw))
    jrow = jnp.stack(jrows, axis=0)  # [L, bh, nt]
    # payload in compute dtype: indices/rows are small integers (exact in
    # bf16); weight rounding matches the bf16 kernel mode anyway
    pay = jnp.stack(payloads, axis=1).astype(compute_dtype)

    nl = len(spatial_shapes)
    rm = wrows * d

    def _val_spec(lvl, wwp):
        return pl.BlockSpec(
            (1, 1, rm, wwp), lambda i, t, jr: (i, jr[lvl, i, t], 0, 0)
        )

    # ---- pass 1: dAttw / dLoc ingredients ----
    aux_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, nt),
        in_specs=[
            pl.BlockSpec((1, nl, 16, ct), lambda i, t, jr: (i, 0, 0, t)),
            pl.BlockSpec((1, d, gw), lambda i, t, jr: (i, 0, t)),
        ]
        + [
            _val_spec(lvl, _round_up(ww, LANE))
            for lvl, (hh, ww) in enumerate(spatial_shapes)
        ],
        out_specs=pl.BlockSpec((1, nl, 8, ct), lambda i, t, jr: (i, 0, 0, t)),
    )
    aux = pl.pallas_call(
        functools.partial(
            _bwd_aux_kernel, wrows, d, stride, nl, p, ctq, compute_dtype
        ),
        grid_spec=aux_spec,
        out_shape=jax.ShapeDtypeStruct((bh, nl, 8, n_pad), jnp.float32),
        interpret=interpret,
    )(jrow, pay, g_r, *window_values)

    # ---- pass 2: dValue window gradients ----
    dval_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, nt),
        in_specs=[
            pl.BlockSpec((1, nl, 16, ct), lambda i, t, jr: (i, 0, 0, t)),
            pl.BlockSpec((1, d, gw), lambda i, t, jr: (i, 0, t)),
        ],
        out_specs=[
            _val_spec(lvl, _round_up(ww, LANE))
            for lvl, (hh, ww) in enumerate(spatial_shapes)
        ],
    )
    dwin = pl.pallas_call(
        functools.partial(
            _bwd_dval_kernel, wrows, d, stride, nl, p, ctq, compute_dtype
        ),
        grid_spec=dval_spec,
        out_shape=[
            jax.ShapeDtypeStruct(
                (bh, _n_windows(hh, stride), rm, _round_up(ww, LANE)),
                jnp.float32,
            )
            for (hh, ww) in spatial_shapes
        ],
        interpret=interpret,
    )(jrow, pay, g_r)

    # assemble dValue: mask never-visited windows, fold overlaps, stack
    dval_parts = []
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        nw = _n_windows(hh, stride)
        visited = jnp.any(
            jrow[lvl][:, :, None] == jnp.arange(nw)[None, None, :], axis=1
        )  # [bh, nw]
        # where(), not multiply: unvisited blocks hold uninitialised
        # garbage that can be NaN/inf (NaN * 0 = NaN)
        dw = jnp.where(visited[:, :, None, None], dwin[lvl], 0.0)
        dval_parts.append(_fold_windows(dw, hh, ww, d, stride, wrows))
    dval = jnp.concatenate(dval_parts, axis=1)  # [bh, k, d]
    # FLAT [b, k, h*d] to match the flat primal (cotangents must mirror
    # the boundary layouts)
    dvalue = (
        dval.reshape(b, h, k, d)
        .swapaxes(1, 2)
        .reshape(b, k, h * d)
        .astype(value.dtype)
    )

    # assemble dLoc / dAttw back to caller layouts
    scale = jnp.array([[ww, hh] for hh, ww in spatial_shapes], jnp.float32)
    dattw_s = aux[:, :, 0, :n].transpose(0, 2, 1)  # [bh, n, l]
    dlocy_s = aux[:, :, 1, :n].transpose(0, 2, 1) * scale[None, None, :, 1]
    dlocx_s = aux[:, :, 2, :n].transpose(0, 2, 1) * scale[None, None, :, 0]
    dloc_s = jnp.stack([dlocx_s, dlocy_s], axis=-1)  # [bh, n, l, 2]
    # FLAT [b, q, h*l*p*2] / [b, q, h*l*p] to match the flat primals; the
    # 6D views live only inside this jit's fusion. The h<->q transpose
    # materializes with tile-padded minors — stage it in the compute dtype
    # (halves the padded buffer in bf16 mode).
    dloc = (
        dloc_s.astype(compute_dtype)
        .reshape(b, h, q, p, l, 2)
        .transpose(0, 2, 1, 4, 3, 5)
        .reshape(b, q, h * l * p * 2)
        .astype(sampling_locations.dtype)
    )
    dattw = (
        dattw_s.astype(compute_dtype)
        .reshape(b, h, q, p, l)
        .transpose(0, 2, 1, 4, 3)
        .reshape(b, q, h * l * p)
        .astype(attention_weights.dtype)
    )
    return dvalue, dloc, dattw


def _bwd(spatial_shapes, heads, points, stride, halo, cap_tile,
         compute_dtype, interpret, res, g):
    value, loc, attw = res
    return _backward(
        value, spatial_shapes, loc, attw, g,
        heads=heads, points=points,
        stride=stride, halo=halo, cap_tile=cap_tile,
        compute_dtype=compute_dtype, interpret=interpret,
    )


_pallas_vjp.defvjp(_fwd, _bwd)


def ms_deform_attn_pallas(
    value,
    spatial_shapes,
    sampling_locations,
    attention_weights,
    *,
    heads=None,
    points=None,
    stride=8,
    halo=8,
    cap_tile=512,
    compute_dtype=jnp.float32,
):
    """Fused windowed TPU deformable attention (see module docstring).

    Exact (vs `ms_deform_attn_jnp`) whenever each 256-item tile's sampled
    rows fit its stride+halo+1-row window — guaranteed for row-coherent
    item orders with offsets within the halo; audit with
    `window_drop_mass`. Differentiable (scatter-free Pallas backward).

    Accepts the 6D loc/attw layouts or the flat [b, q, h*l*p*(2)] ones
    (with heads/points implied by value's 4D shape when 6D). Arrays are
    flattened HERE, before the custom_vjp/jit boundary — boundary arrays
    with tiny minor dims get tile-padded layouts (32x memory, the base
    train OOM). Off-TPU (unit tests) the kernel runs interpreted."""
    try:
        interpret = jax.devices()[0].platform != "tpu"
    except Exception:  # pragma: no cover
        interpret = True
    if sampling_locations.ndim == 6:
        b0, q0, heads, _, points, _ = sampling_locations.shape
        sampling_locations = sampling_locations.reshape(b0, q0, -1)
        attention_weights = attention_weights.reshape(b0, q0, -1)
    elif heads is None or points is None:
        raise ValueError("flat loc layout requires heads= and points=")
    if value.ndim == 4:
        value = value.reshape(value.shape[0], value.shape[1], -1)
    return _pallas_vjp(
        value,
        spatial_shapes,
        sampling_locations,
        attention_weights,
        heads,
        points,
        stride,
        halo,
        cap_tile,
        compute_dtype,
        interpret,
    )
