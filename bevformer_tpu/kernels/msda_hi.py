"""Heads-inner fused Pallas TPU kernel for multi-scale deformable attention
(round-3 redesign of `kernels/msda_pallas.py`; same contract as the
reference CUDA `ms_deform_attn_forward`,
`multi_scale_deformable_attn_function.py:15-124`).

Why a redesign: probe decomposition at base SCA scale
(tools/bench_kernel_probe3.py, BENCH_NOTES round 3) split the v2 kernel's
64 ms as ~26 ms XLA PREP — the [b,q,h,l,p,2] -> [b*h, n, l, 2] 6D
transposes that move the head axis into the batch (tiny-minor-dim
relayouts) — plus ~9 ms payload DMA, ~7 ms window DMA, ~20 ms matmul; the
in-kernel wcol build and row-combine are fully hidden. The head move is
unavoidable for a (b*h, tiles) grid, so v3 uses a (b, tiles) grid with all
heads INSIDE a step:

  * Tiles are QUERY-BLOCK-MAJOR with point streams innermost: tile
    t = qblock * npnt + point (a tile is ct consecutive sorted queries of
    ONE point stream; all npnt point tiles of a query block are adjacent,
    so the per-(level, head) window panel — indexed by t // npnt — stays
    resident across the npnt steps of a block instead of being re-DMAed
    per stream). With the caller emitting offset/weight channels in
    (level, head, point) order (free via Dense param-column permutation),
    every payload channel is an elementwise map of one ROW of the
    2D-transposed flat activations — ONE clean [n, C] -> [C, n] transpose
    (big minors, full-bandwidth) replaces the 6D relayout, and channels
    stack contiguously into per-tile payload blocks [b, nt, L*H*6, ct] in
    the compute dtype (bf16-exact: column/row indices < 256).
  * Per-point tiles also kill the in-kernel point-sum: the per-query sum
    over p happens as a dense reshape-sum on the output (no slot-lane
    padding, no iota matmul) and the backward's per-query cotangent is a
    contiguous block per tile.
  * Window-value blocks are HEAD-MAJOR, grouped per halo CLASS:
    out[lvl][cls] = [b, nw, h_cls, wrows_cls*d, wwp_l]; each (level,
    head) matmul slices one contiguous [wrows_h*d, wwp] panel — same MXU
    work as v2, 8x fewer grid steps/block-fetch latencies. Windows are
    PER (query block, head) with PER-HEAD halos (the grid-init offset
    bias is one-directional per head, so pure-x heads need rows only for
    the tile span while y-heads add the point-scale spread; audit with
    `window_drop_mass_hi`). Fully out-of-image items are excluded from
    the window choice (they contribute zero output).
  * Bilinear factorization, out-of-window drop semantics and the
    scatter-free design are v2's; v2's oracle tests pin v3 too
    (tests/test_msda_hi.py).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bevformer_tpu.kernels.msda import _level_bounds
from bevformer_tpu.kernels.msda_pallas import (
    _n_windows,
    _round_up,
    _tile_windows,
)

LANE = 128
NCH = 6  # payload channels per (level, head): x0, wx0, wx1, y0, wy0, wy1


def effective_halo(stride: int, halo) -> int:
    """Identity (kept for call-site compatibility): wrows used to be
    rounded up to a stride multiple for the grouped window construction;
    `prepare_window_values_*` now stack whole stride-row groups PLUS one
    partial (wrows % stride)-row group, so any wrows works. The kernel
    matmul M dim is wrows*d — at base SCA scale each surplus window row
    measured ~1 ms/layer (tools/bench_hi_sweep.py wrows 16 -> 12 = 25.4
    -> 21.3 ms), so halos are no longer silently widened."""
    del stride
    return halo


def _halos_tuple(halo, h) -> tuple:
    """Normalize a halo spec to a per-head tuple of length h.

    The grid-init offset bias is ONE-directional per head (s_h*(i+1)), so
    per-head row spreads differ wildly: at base SCA the pure-x heads
    (0, 4 of 8) are drop-free at halo 2 where the y-heads need 9
    (tools/audit_halo + per-head audit, BENCH_NOTES round 4). Per-head
    halos cut the window matmul M dim head-by-head; heads sharing a halo
    share one window array (see _head_classes)."""
    if isinstance(halo, (tuple, list)):
        if len(halo) != h:  # e.g. an 8-head default on a toy model
            return (int(max(halo)),) * h
        return tuple(int(x) for x in halo)
    return (int(halo),) * h


def _head_classes(halos: tuple):
    """Group heads by halo value. Returns (distinct_halos, cls_of_head,
    pos_in_class, heads_of_class) — heads with equal halo share one
    window array, indexed by their position within the class."""
    distinct = sorted(set(halos))
    cls_of = tuple(distinct.index(x) for x in halos)
    pos_in = []
    counts = [0] * len(distinct)
    for c in cls_of:
        pos_in.append(counts[c])
        counts[c] += 1
    heads_of = tuple(
        tuple(i for i, c in enumerate(cls_of) if c == ci)
        for ci in range(len(distinct))
    )
    return tuple(distinct), cls_of, tuple(pos_in), heads_of


def prepare_window_values_hi(
    value: jnp.ndarray,  # [B, K, H*D] (flat) or [B, K, H, D]
    spatial_shapes,
    *,
    heads: Optional[int] = None,
    stride: int = 4,
    halo=13,
    compute_dtype=jnp.bfloat16,
):
    """Per-level, per-halo-class HEAD-MAJOR overlapping row-window blocks:
    returns out[lvl][cls] = [B, nw, Hc, wrows_c*D, WWp]; window j holds
    image rows [j*stride, j*stride + wrows_c) (zero-padded past the
    image). With a scalar halo there is a single class (out[lvl][0])."""
    if value.ndim == 4:
        b, k, h, d = value.shape
        val = value
    else:
        b, k, hd = value.shape
        h = heads
        d = hd // h
        val = value.reshape(b, k, h, d)
    starts, sizes, total = _level_bounds(spatial_shapes)
    assert total == k
    halos = _halos_tuple(halo, h)
    distinct, _, _, heads_of = _head_classes(halos)
    out = []
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        nw = _n_windows(hh, stride)
        wwp = _round_up(ww, LANE)
        img0 = jax.lax.dynamic_slice_in_dim(val, starts[lvl], hh * ww, 1)
        img0 = img0.reshape(b, hh, ww, h, d).astype(compute_dtype)
        per_cls = []
        for ci, hv in enumerate(distinct):
            wrows = stride + hv + 1
            g = wrows // stride  # full stride-row groups per window
            rem = wrows % stride  # plus one partial group of rem rows
            hc = len(heads_of[ci])
            img = img0[:, :, :, list(heads_of[ci]), :]
            hpad = (nw + g) * stride  # >= (nw - 1) * stride + wrows
            img = jnp.pad(
                img,
                ((0, 0), (0, hpad - hh), (0, wwp - ww), (0, 0), (0, 0)),
            )
            # ONE big transpose (minor ww stays large), then whole-group
            # stacking: window j = stride-row groups j .. j+g-1 (+ the
            # first rem rows of group j+g)
            t = img.transpose(0, 3, 1, 4, 2)  # [b, hc, hpad, d, wwp]
            tg = t.reshape(b, hc, hpad // stride, stride, d, wwp)
            tgf = tg.reshape(b, hc, hpad // stride, stride * d, wwp)
            parts = [tgf[:, :, o: o + nw] for o in range(g)]
            if rem:
                parts.append(
                    tg[:, :, g: g + nw, :rem].reshape(
                        b, hc, nw, rem * d, wwp
                    )
                )
            wins = jnp.concatenate(
                [p.reshape(b, hc, nw, -1, wwp) for p in parts], axis=3
            )  # [b, hc, nw, wrows*d, wwp]
            per_cls.append(wins.transpose(0, 2, 1, 3, 4))
        out.append(per_cls)  # out[lvl][cls] = [b, nw, hc, rm_c, wwp]
    return out


def prepare_window_values_cm(
    value_cm: jnp.ndarray,  # [B, H*D, K] or [B, H, D, K] CHANNEL-MAJOR
    spatial_shapes,
    *,
    heads: Optional[int] = None,
    stride: int = 4,
    halo: int = 13,
    compute_dtype=jnp.bfloat16,
):
    """`prepare_window_values_hi` from a CHANNEL-MAJOR value layout
    [B, H*D, K]: the per-level build is slice + pad + NON-minor
    (row-group <-> d) transpose + grouped stack — the minor dim (ww)
    never moves. The row-major path's d<->ww relayout measured
    ~7.5 ms/layer at base SCA scale (tools/bench_hi_probe.py xpose);
    producing value channel-major straight out of the projection matmul
    costs ~0.4 ms (XLA fuses the output transpose into the dot), making
    this the cheap path when the caller controls the projection."""
    if value_cm.ndim == 4:
        b, h, d, k = value_cm.shape
        val = value_cm.reshape(b, h * d, k)
    else:
        b, hd, k = value_cm.shape
        h = heads
        d = hd // h
        val = value_cm
    starts, sizes, total = _level_bounds(spatial_shapes)
    assert total == k
    halos = _halos_tuple(halo, h)
    distinct, _, _, heads_of = _head_classes(halos)
    out = []
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        nw = _n_windows(hh, stride)
        wwp = _round_up(ww, LANE)
        img0 = jax.lax.dynamic_slice_in_dim(val, starts[lvl], hh * ww, 2)
        img0 = img0.reshape(b, h, d, hh, ww).astype(compute_dtype)
        per_cls = []
        for ci, hv in enumerate(distinct):
            wrows = stride + hv + 1
            g = wrows // stride
            rem = wrows % stride
            hc = len(heads_of[ci])
            img = img0[:, list(heads_of[ci])]
            hpad = (nw + g) * stride
            img = jnp.pad(
                img,
                ((0, 0), (0, 0), (0, 0), (0, hpad - hh), (0, wwp - ww)),
            )
            tg = img.reshape(b, hc, d, hpad // stride, stride, wwp)
            tg = tg.transpose(0, 3, 1, 4, 2, 5)  # [b, ng, hc, stride, d, wwp]
            parts = [
                tg.reshape(
                    b, hpad // stride, hc, stride * d, wwp
                )[:, o: o + nw]
                for o in range(g)
            ]
            if rem:
                parts.append(
                    tg[:, g: g + nw, :, :rem].reshape(
                        b, nw, hc, rem * d, wwp
                    )
                )
            per_cls.append(jnp.concatenate(parts, axis=3))
        out.append(per_cls)  # out[lvl][cls] = [b, nw, hc, rm_c, wwp]
    return out


def _kernel_hi(d, h, stride, n_levels, ct, npnt, compute_dtype,
               jrow_ref, pay_ref, *refs):
    """One (batch, item-tile) step: ALL levels and heads fused.

    Tiles are QUERY-BLOCK-major with the npnt point streams innermost
    (t = qblock * npnt + point): the per-(level, head) window index
    jrow[.., t // npnt] is CONSTANT across the npnt consecutive steps of
    one query block, so Pallas skips the window-panel refetch — the
    window DMA sweep runs once per query range instead of once per point
    stream (the stream-major order measured a 17.9 ms pure-DMA floor of
    the 29 ms SCA stage; see BENCH_NOTES round 3).

    pay_ref: [1, 1, L*H*NCH, ct]; per (level, head): (x0, wx0, wx1, y0,
             wy0, wy1) — indices exact integers (< 256, bf16-exact), y0
             the GLOBAL image row.
    refs:    L window-block refs [1, 1, H, wrows*D, WWp_l] + out_ref
             [1, 1, H*D, ct] (per-ITEM outputs; the per-query point sum
             is a dense reshape-sum outside)."""
    i = pl.program_id(0)
    t = pl.program_id(1)
    val_refs = refs[:n_levels * h]
    out_ref = refs[n_levels * h]
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    for hd_i in range(h):
        acc = jnp.zeros((d, ct), jnp.float32)
        for lvl in range(n_levels):
            c0 = (lvl * h + hd_i) * NCH
            pay = pay_ref[0, 0, c0: c0 + NCH, :].astype(jnp.float32)
            y0 = pay[3:4]
            wy0 = pay[4:5]
            wy1 = pay[5:6]
            val = val_refs[lvl * h + hd_i][0, 0, 0]  # [wrows_h*d, wwp]
            wwp = val.shape[-1]
            wrows_h = val.shape[0] // d  # per-HEAD window rows (halo_h)
            # wcol build stays in i32 compares + f32 selects: the v5e VPU
            # has NO sub-f32 compare ("Target does not support this
            # comparison" for bf16 arith.cmpf) — a native-bf16 build was
            # tried and rejected by Mosaic (round 4).
            cio = jax.lax.broadcasted_iota(jnp.int32, (wwp, ct), 0)
            xi = pay[0:1].astype(jnp.int32)
            wcol = (
                jnp.where(cio == xi, pay[1:2], 0.0)
                + jnp.where(cio == xi + 1, pay[2:3], 0.0)
            )
            tmat = jnp.dot(
                val.astype(compute_dtype),
                wcol.astype(compute_dtype),
                preferred_element_type=jnp.float32,
                precision=precision,
            )  # [wrows*d, ct]
            base = (
                jrow_ref[lvl * h + hd_i, i, t // npnt] * stride
            ).astype(jnp.float32)
            for r in range(wrows_h):
                fr = base + float(r)
                wr = (
                    jnp.where(y0 == fr, wy0, 0.0)
                    + jnp.where(y0 == fr - 1.0, wy1, 0.0)
                )
                acc = acc + wr * tmat[r * d: (r + 1) * d]
        out_ref[0, 0, hd_i * d: (hd_i + 1) * d, :] = acc.astype(
            out_ref.dtype
        )


def _bilinear_channels(locT, awT, spatial_shapes, h, p, unfold_aw=False):
    """Vectorized bilinear payload math over ALL (l, h, p) channels.

    locT [b, 2*nch, q_pad] / awT [b, nch, q_pad], channels (l, h, p).
    Returns (chan6 [b, nch, 6, q_pad] f32, extras [b, nch, 5, q_pad] f32,
    y0i [b, nch, q_pad] i32); extras = (vy0, vy1, aw, vx0, vx1) for the
    backward's unfolded payload (unfold_aw=True leaves aw OUT of the wx
    channels). Bulk ops replace the 384 per-channel slices the original
    prep emitted (measured 14 ms/layer of pure XLA overhead at base SCA
    scale, tools/bench_hi_probe.py)."""
    l = len(spatial_shapes)
    nch = l * h * p
    ww_vec = jnp.repeat(
        jnp.array([ww for _, ww in spatial_shapes], jnp.float32), h * p
    )[None, :, None]
    hh_vec = jnp.repeat(
        jnp.array([hh for hh, _ in spatial_shapes], jnp.float32), h * p
    )[None, :, None]
    x = locT[:, 0::2] * ww_vec - 0.5
    y = locT[:, 1::2] * hh_vec - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    wwi = ww_vec.astype(jnp.int32)
    hhi = hh_vec.astype(jnp.int32)
    vx0 = ((x0i >= 0) & (x0i < wwi)).astype(jnp.float32)
    vx1 = ((x0i >= -1) & (x0i < wwi - 1)).astype(jnp.float32)
    vy0 = ((y0i >= 0) & (y0i < hhi)).astype(jnp.float32)
    vy1 = ((y0i >= -1) & (y0i < hhi - 1)).astype(jnp.float32)
    x0c = jnp.minimum(jnp.maximum(x0i, -1), wwi - 1).astype(jnp.float32)
    awx = jnp.ones_like(awT) if unfold_aw else awT
    chan6 = jnp.stack(
        [
            x0c,
            awx * (1.0 - tx) * vx0,
            awx * tx * vx1,
            y0,
            (1.0 - ty) * vy0,
            ty * vy1,
        ],
        axis=2,
    )  # [b, nch, 6, q_pad]
    extras = jnp.stack([vy0, vy1, awT, vx0, vx1], axis=2)
    return chan6, extras, y0i


def _jrow_levels(y0i, spatial_shapes, h, p, ntq, ct, stride, wrows_h):
    """Per-(level, head) tile-window indices, batched per level.

    y0i [b, nch(l,h,p), q_pad] -> jrow [L*H, b, ntq]. Window per (QUERY
    BLOCK, HEAD), shared across the head's point streams: per-head
    windows keep the halo at the one-directional per-head offset spread
    (~8 rows at grid init) instead of the cross-head +-8 a fully shared
    window would need; j is monotone over query blocks per head (the
    backward accumulation relies on it). wrows_h: per-head window rows
    (length-h tuple) — `_tile_windows` centers/clamps each head's window
    with its own width (rows are head-major, so the per-row wrows column
    broadcasts)."""
    b = y0i.shape[0]
    wr = jnp.repeat(jnp.asarray(wrows_h, jnp.int32), b)[:, None]  # [h*b, 1]
    jrows = []
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        nw = _n_windows(hh, stride)
        yl = y0i[:, lvl * h * p: (lvl + 1) * h * p]
        yl = yl.reshape(b, h, p, ntq, ct).transpose(1, 0, 3, 2, 4)
        yl = yl.reshape(h * b, ntq * p * ct)
        # fully out-of-image rows contribute ZERO output (both bilinear
        # corners masked) — exclude them from the window choice so dead
        # items (SCA routing slack slots project anywhere) never drag the
        # window off the live ones
        dead = (yl < -1) | (yl >= hh)
        j = _tile_windows(
            jnp.where(dead, 4 * hh + 8, yl), ntq, p * ct, stride, wr, nw,
            y0i_hi=jnp.where(dead, -4 * hh - 8, yl),
        )
        jrows.append(j.reshape(h, b, ntq))
    return jnp.concatenate(jrows, axis=0)  # [L*H, b, ntq]


def _prep_hi(sampling_locations, attention_weights, spatial_shapes,
             h, p, ct, stride, wrows_h, compute_dtype):
    """Vectorized payload prep (see _bilinear_channels).

    Returns (pay [b, nt, L*H*NCH, ct], jrow [L*H, b, ntq], q_pad, nt,
    ntq). wrows_h: per-head window rows (length-h tuple)."""
    b, qn, _ = sampling_locations.shape
    l = len(spatial_shapes)
    ntq = -(-qn // ct)
    q_pad = ntq * ct
    nt = p * ntq

    # ONE clean 2D transpose each (minor dims are both large)
    locT = jnp.swapaxes(sampling_locations.astype(jnp.float32), 1, 2)
    awT = jnp.swapaxes(attention_weights.astype(jnp.float32), 1, 2)
    if q_pad != qn:
        locT = jnp.pad(locT, ((0, 0), (0, 0), (0, q_pad - qn)),
                       mode="edge")
        awT = jnp.pad(awT, ((0, 0), (0, 0), (0, q_pad - qn)))

    chan6, _, y0i = _bilinear_channels(locT, awT, spatial_shapes, h, p)
    # [b, (lh, p), 6, (ntq, ct)] -> [b, ntq, p, lh, 6, ct] (minor ct
    # stays big through the relayout) -> [b, nt, L*H*NCH, ct]; tiles are
    # QUERY-BLOCK-major, point streams innermost (see _kernel_hi)
    chan6 = chan6.astype(compute_dtype)
    pay = chan6.reshape(b, l * h, p, NCH, ntq, ct).transpose(0, 4, 2, 1, 3, 5)
    pay = pay.reshape(b, nt, l * h * NCH, ct)
    jrow = _jrow_levels(y0i, spatial_shapes, h, p, ntq, ct, stride, wrows_h)
    return pay, jrow, q_pad, nt, ntq


def _jrow_lohi(lo, hi, spatial_shapes, h, ntq, stride, wrows_h):
    """`_jrow_levels` from PRE-REDUCED per-(tile, level, head) row bounds.

    lo/hi [b, ntq, L*H] i32 (dead items pre-masked to +/-big before the
    reduction) -> jrow [L*H, b, ntq]. Lets the fused payload prep reduce
    y0 extremes inline instead of materializing the [b, nch, q] y0i
    array."""
    b = lo.shape[0]
    wr = jnp.repeat(jnp.asarray(wrows_h, jnp.int32), b)[:, None]  # [h*b, 1]
    jrows = []
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        nw = _n_windows(hh, stride)
        lol = lo[:, :, lvl * h: (lvl + 1) * h]
        hil = hi[:, :, lvl * h: (lvl + 1) * h]
        lol = lol.transpose(2, 0, 1).reshape(h * b, ntq)
        hil = hil.transpose(2, 0, 1).reshape(h * b, ntq)
        j = _tile_windows(lol, ntq, 1, stride, wr, nw, y0i_hi=hil)
        jrows.append(j.reshape(h, b, ntq))
    return jnp.concatenate(jrows, axis=0)  # [L*H, b, ntq]


def _prep_hi_lw(lw, ref_sorted, spatial_shapes, h, p, ct, stride, wrows_h,
                compute_dtype):
    """Fused payload prep from the SORTED packed projection tensor.

    lw [b, n, 3*nch]: per item, channels (p, l, h, 2) normalized offsets
    followed by (p, l, h) attention weights (bf16 in bf16 mode — the
    caller's sort gather moves HALF the bytes of the decoded f32 form).
    ref_sorted [b, n, 2] f32: frame-constant sorted reference points
    (hoisted out of the layer loop by `sca_capacity_precompute`).

    Replaces the decode -> [b, n, 2nch] f32 loc materialization ->
    swapaxes -> `_bilinear_channels` -> 6D relayout chain of `_prep_hi`
    (~1.4 GB/layer of HBM traffic at base SCA shapes) with ONE bf16
    relayout of lw and elementwise math emitting `pay` directly in the
    kernel's tile layout; the jrow row bounds are reduced inline."""
    b, qn, C = lw.shape
    l = len(spatial_shapes)
    nch = l * h * p
    assert C == 3 * nch, (C, nch)
    ntq = -(-qn // ct)
    q_pad = ntq * ct
    nt = p * ntq
    if q_pad != qn:
        lw = jnp.pad(lw, ((0, 0), (0, q_pad - qn), (0, 0)), mode="edge")
        ref_sorted = jnp.pad(
            ref_sorted, ((0, 0), (0, q_pad - qn), (0, 0)), mode="edge"
        )
    # ONE relayout of everything: [b, n, C] -> [b, ntq, C, ct]
    lwT = jnp.swapaxes(lw.reshape(b, ntq, ct, C), 2, 3)
    refT = jnp.swapaxes(
        ref_sorted.astype(jnp.float32).reshape(b, ntq, ct, 2), 2, 3
    )  # [b, ntq, 2, ct]
    off = lwT[:, :, : 2 * nch].astype(jnp.float32)
    off = off.reshape(b, ntq, p, l * h, 2, ct)
    aw = lwT[:, :, 2 * nch:].astype(jnp.float32)
    aw = aw.reshape(b, ntq, p, l * h, ct)
    ww_vec = jnp.repeat(
        jnp.array([ww for _, ww in spatial_shapes], jnp.float32), h
    )[None, None, None, :, None]
    hh_vec = jnp.repeat(
        jnp.array([hh for hh, _ in spatial_shapes], jnp.float32), h
    )[None, None, None, :, None]
    x = (off[:, :, :, :, 0, :] + refT[:, :, None, None, 0, :]) * ww_vec - 0.5
    y = (off[:, :, :, :, 1, :] + refT[:, :, None, None, 1, :]) * hh_vec - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    wwi = ww_vec.astype(jnp.int32)
    hhi = hh_vec.astype(jnp.int32)
    vx0 = ((x0i >= 0) & (x0i < wwi)).astype(jnp.float32)
    vx1 = ((x0i >= -1) & (x0i < wwi - 1)).astype(jnp.float32)
    vy0 = ((y0i >= 0) & (y0i < hhi)).astype(jnp.float32)
    vy1 = ((y0i >= -1) & (y0i < hhi - 1)).astype(jnp.float32)
    x0c = jnp.minimum(jnp.maximum(x0i, -1), wwi - 1).astype(jnp.float32)
    chan6 = jnp.stack(
        [
            x0c,
            aw * (1.0 - tx) * vx0,
            aw * tx * vx1,
            y0,
            (1.0 - ty) * vy0,
            ty * vy1,
        ],
        axis=4,
    )  # [b, ntq, p, l*h, 6, ct]
    pay = chan6.astype(compute_dtype).reshape(b, nt, l * h * NCH, ct)
    # dead rows (both bilinear corners off-image) must not drag windows
    bigv = 4 * hhi + 8
    lo = jnp.where((y0i < -1) | (y0i >= hhi), bigv, y0i).min(axis=(2, 4))
    hi = jnp.where((y0i < -1) | (y0i >= hhi), -bigv, y0i).max(axis=(2, 4))
    jrow = _jrow_lohi(lo, hi, spatial_shapes, h, ntq, stride, wrows_h)
    return pay, jrow, q_pad, nt, ntq


@functools.partial(
    jax.jit,
    static_argnames=(
        "spatial_shapes", "heads", "points", "stride", "halo", "cap_tile",
        "compute_dtype", "interpret",
    ),
)
def _forward_hi(
    value,  # [b, k, h*d] or [b, k, h, d]; None with value_cm
    spatial_shapes,
    sampling_locations,  # [b, q', L*H*P*2] FLAT, channels (l, h, p, 2)
    attention_weights,  # [b, q', L*H*P] FLAT, channels (l, h, p)
    window_values=None,
    *,
    heads,
    points,
    stride=4,
    halo=13,
    cap_tile=512,
    compute_dtype=jnp.float32,
    interpret=False,
    value_cm=None,  # [b, h*d, k] CHANNEL-MAJOR alternative to `value`
):
    if value_cm is not None:
        if value_cm.ndim == 4:
            value_cm = value_cm.reshape(
                value_cm.shape[0], -1, value_cm.shape[3])
        b, hd, k = value_cm.shape
        out_dtype = value_cm.dtype
    else:
        if value.ndim == 4:
            value = value.reshape(value.shape[0], value.shape[1], -1)
        b, k, hd = value.shape
        out_dtype = value.dtype
    h, p = heads, points
    d = hd // h
    qn = sampling_locations.shape[1]
    l = len(spatial_shapes)
    halos = _halos_tuple(halo, h)
    cls_of = _head_classes(halos)[1]
    pos_in = _head_classes(halos)[2]
    wrows_h = tuple(stride + hv + 1 for hv in halos)
    ct = cap_tile

    if window_values is None:
        if value_cm is not None:
            window_values = prepare_window_values_cm(
                value_cm, spatial_shapes, heads=h, stride=stride,
                halo=halos, compute_dtype=compute_dtype,
            )
        else:
            window_values = prepare_window_values_hi(
                value, spatial_shapes, heads=h, stride=stride, halo=halos,
                compute_dtype=compute_dtype,
            )

    pay, jrow, q_pad, nt, ntq = _prep_hi(
        sampling_locations, attention_weights, spatial_shapes,
        h, p, ct, stride, wrows_h, compute_dtype,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec(
                (1, 1, l * h * NCH, ct), lambda i, t, jr: (i, t, 0, 0)
            )
        ]
        + [
            # t // p here MUST mirror _kernel_hi's t // npnt (npnt == p is
            # passed positionally into its functools.partial): both recover
            # the query-block index from the block-major tile id. Each
            # (level, head) ref slices head pos_in[hd] of its halo CLASS
            # array; the block's row count wrows_h[hd]*d is per-head.
            (lambda li_, wwp_, rm_, pos_: pl.BlockSpec(
                (1, 1, 1, rm_, wwp_),
                lambda i, t, jr, li=li_, po=pos_: (
                    i, jr[li, i, t // p], po, 0, 0),
            ))(lvl_ * h + hd_, _round_up(ww, LANE), wrows_h[hd_] * d,
               pos_in[hd_])
            for lvl_, (hh, ww) in enumerate(spatial_shapes)
            for hd_ in range(h)
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h * d, ct), lambda i, t, jr: (i, t, 0, 0)
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_hi, d, h, stride, l, ct, p, compute_dtype,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nt, h * d, ct), compute_dtype),
        interpret=interpret,
    )(jrow, pay, *[
        window_values[lvl][cls_of[hd_]]
        for lvl in range(l) for hd_ in range(h)
    ])

    # per-query point sum + back to [b, q', h*d]; the (h*d, ct)->(ct, h*d)
    # swap has BOTH minors >= 128 (no tiny-minor relayout)
    out = out.reshape(b, ntq, p, h * d, ct).sum(axis=2)
    out = out.transpose(0, 1, 3, 2).reshape(b, q_pad, h * d)
    return out[:, :qn].astype(out_dtype)


def window_drop_mass_hi(
    spatial_shapes, sampling_locations, attention_weights, *,
    heads, points, stride=4, halo=13, cap_tile=512,
):
    """In-graph audit: attention mass lost to out-of-window rows for the
    heads-inner, query-block-major tiling (per-(query-block, head) window
    shared across that head's point streams; per-head halos supported).
    Returns [n_levels]."""
    b, qn, _ = sampling_locations.shape
    h, p = heads, points
    l = len(spatial_shapes)
    ct = cap_tile
    halos = _halos_tuple(halo, h)
    wrows_h = tuple(stride + hv + 1 for hv in halos)
    ntq = -(-qn // ct)
    q_pad = ntq * ct

    loc = sampling_locations.astype(jnp.float32).reshape(b, qn, l, h, p, 2)
    attw = attention_weights.astype(jnp.float32).reshape(b, qn, l, h, p)
    if q_pad != qn:
        loc = jnp.pad(
            loc, ((0, 0), (0, q_pad - qn), (0, 0), (0, 0), (0, 0), (0, 0)),
            mode="edge",
        )
        attw = jnp.pad(
            attw, ((0, 0), (0, q_pad - qn), (0, 0), (0, 0), (0, 0))
        )
    dropped = []
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        nw = _n_windows(hh, stride)
        y = loc[:, :, lvl, :, :, 1] * hh - 0.5  # [b, q_pad, h, p]
        y0 = jnp.floor(y)
        ty = y - y0
        y0i = y0.astype(jnp.int32)
        # per-(query block, head) windows shared across the head's point
        # streams — same construction as _prep_hi
        ys = y0i.reshape(b, ntq, ct, h, p).transpose(0, 3, 1, 4, 2)
        # [b, h, ntq, p, ct]
        # dead-row masking MUST mirror _jrow_levels (fully out-of-image
        # items are excluded from the window choice)
        dead = (ys < -1) | (ys >= hh)
        ys_lo = jnp.where(dead, 4 * hh + 8, ys)
        ys_hi = jnp.where(dead, -4 * hh - 8, ys)
        jrow_h = jnp.stack([
            _tile_windows(
                ys_lo[:, hd_i].reshape(b, ntq * p * ct), ntq, p * ct,
                stride, wrows_h[hd_i], nw,
                y0i_hi=ys_hi[:, hd_i].reshape(b, ntq * p * ct),
            )
            for hd_i in range(h)
        ], axis=1)  # [b, h, ntq]
        base = (jrow_h * stride).transpose(0, 2, 1)[
            :, None, :, :, None
        ]  # [b, 1, ntq, h, 1]
        y0g = y0i.reshape(b, ntq, ct, h, p).transpose(0, 4, 1, 3, 2)
        tyg = ty.reshape(b, ntq, ct, h, p).transpose(0, 4, 1, 3, 2)
        awg = attw[:, :, lvl].reshape(b, ntq, ct, h, p).transpose(
            0, 4, 1, 3, 2
        )
        wy0 = (1.0 - tyg) * ((y0g >= 0) & (y0g < hh))
        wy1 = tyg * ((y0g >= -1) & (y0g < hh - 1))
        wrv = jnp.array(wrows_h, jnp.int32)[None, None, None, :, None]
        out0 = (y0g < base) | (y0g > base + wrv - 1)
        out1 = (y0g + 1 < base) | (y0g + 1 > base + wrv - 1)
        lost = awg * (wy0 * out0 + wy1 * out1)
        dropped.append(lost.sum())
    return jnp.stack(dropped)


NCHB = 12  # backward payload channels per (point, level, head)


def _prep_hi_bwd(sampling_locations, attention_weights, spatial_shapes,
                 h, p, ct, stride, wrows_h, compute_dtype):
    """Backward payload [b, ntq, P*L*H*NCHB, ct] (points OUTER) + the same
    per-query-block jrow as the forward. Channels per (p, l, h):
    (x0, wx0n, wx1n, y0, wy0, wy1, vy0, vy1, aw, vx0, vx1, 0) — forward
    weights UNFOLDED (aw separate) plus corner validities for dLoc."""
    b, qn, _ = sampling_locations.shape
    l = len(spatial_shapes)
    ntq = -(-qn // ct)
    q_pad = ntq * ct

    locT = jnp.swapaxes(sampling_locations.astype(jnp.float32), 1, 2)
    awT = jnp.swapaxes(attention_weights.astype(jnp.float32), 1, 2)
    if q_pad != qn:
        locT = jnp.pad(locT, ((0, 0), (0, 0), (0, q_pad - qn)),
                       mode="edge")
        awT = jnp.pad(awT, ((0, 0), (0, 0), (0, q_pad - qn)))

    chan6, extras, y0i = _bilinear_channels(
        locT, awT, spatial_shapes, h, p, unfold_aw=True
    )
    chan12 = jnp.concatenate(
        [chan6, extras, jnp.zeros_like(chan6[:, :, :1])], axis=2
    ).astype(compute_dtype)  # [b, nch(l,h,p), 12, q_pad]
    # -> channel order (p, l, h) x NCHB, tiles = query blocks
    pay = chan12.reshape(b, l, h, p, NCHB, ntq, ct)
    pay = pay.transpose(0, 5, 3, 1, 2, 4, 6)  # [b, ntq, p, l, h, 12, ct]
    pay = pay.reshape(b, ntq, p * l * h * NCHB, ct)
    jrow = _jrow_levels(y0i, spatial_shapes, h, p, ntq, ct, stride, wrows_h)
    return pay, jrow, q_pad, ntq


def _rowcomb_hi(tm, w0, w1, y0, base, wrows, d):
    acc = jnp.zeros((d, tm.shape[-1]), jnp.float32)
    for r in range(wrows):
        fr = base + float(r)
        wr = jnp.where(y0 == fr, w0, 0.0) + jnp.where(y0 == fr - 1.0, w1, 0.0)
        acc = acc + wr * tm[r * d: (r + 1) * d]
    return acc


def _bwd_aux_kernel_hi(d, h, p, stride, n_levels, ct, compute_dtype,
                       jrow_ref, pay_ref, g_ref, *refs):
    """Per (b, query-block): dAttw and dLoc ingredients for every
    (point, level, head), cotangent dot reduced in-kernel.

    out_ref [1, 1, P*L*H*4, ct]: channels (dattw, dlocy_raw, dlocx_raw, 0)
    — *_raw lack the hh/ww scale (applied by the caller); the attw factor
    of dLoc is folded in here."""
    i = pl.program_id(0)
    t = pl.program_id(1)
    val_refs = refs[:n_levels * h]
    out_ref = refs[n_levels * h]
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    for p_i in range(p):
        for lvl in range(n_levels):
            for hd_i in range(h):
                base = (
                    jrow_ref[lvl * h + hd_i, i, t] * stride
                ).astype(jnp.float32)
                c0 = ((p_i * n_levels + lvl) * h + hd_i) * NCHB
                pay = pay_ref[0, 0, c0: c0 + NCHB, :].astype(jnp.float32)
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
                g = g_ref[0, hd_i * d: (hd_i + 1) * d, :].astype(jnp.float32)
                val = val_refs[lvl * h + hd_i][0, 0, 0]
                wwp = val.shape[-1]
                wrows = val.shape[0] // d  # per-HEAD window rows (halo_h)
                cio = jax.lax.broadcasted_iota(jnp.int32, (wwp, ct), 0)
                xi = x0.astype(jnp.int32)
                wcol = (jnp.where(cio == xi, wx0n, 0.0)
                        + jnp.where(cio == xi + 1, wx1n, 0.0))
                tm = jnp.dot(
                    val.astype(compute_dtype), wcol.astype(compute_dtype),
                    preferred_element_type=jnp.float32, precision=precision,
                )
                wcol_dx = (jnp.where(cio == xi, -vx0, 0.0)
                           + jnp.where(cio == xi + 1, vx1, 0.0))
                tm_dx = jnp.dot(
                    val.astype(compute_dtype),
                    wcol_dx.astype(compute_dtype),
                    preferred_element_type=jnp.float32, precision=precision,
                )
                s_plain = _rowcomb_hi(tm, wy0, wy1, y0, base, wrows, d)
                dy_o = _rowcomb_hi(tm, -vy0, vy1, y0, base, wrows, d)
                dx_o = _rowcomb_hi(tm_dx, wy0, wy1, y0, base, wrows, d)
                dattw = (g * s_plain).sum(axis=0, keepdims=True)
                dlocy = attw * (g * dy_o).sum(axis=0, keepdims=True)
                dlocx = attw * (g * dx_o).sum(axis=0, keepdims=True)
                o0 = ((p_i * n_levels + lvl) * h + hd_i) * 4
                out_ref[0, 0, o0: o0 + 1, :] = dattw.astype(out_ref.dtype)
                out_ref[0, 0, o0 + 1: o0 + 2, :] = dlocy.astype(out_ref.dtype)
                out_ref[0, 0, o0 + 2: o0 + 3, :] = dlocx.astype(out_ref.dtype)


def _bwd_dval_kernel_hi(d, h, p, stride, n_levels, ct,
                        compute_dtype, h_lo, h_hi,
                        jrow_ref, pay_ref, g_ref, *out_refs):
    """Per (b, query-block): accumulate dValue window-gradient blocks
    [1, 1, h, wrows*d, wwp] per level. Query blocks sharing a window index
    (j is cummax-monotone over blocks) accumulate into the same VMEM
    block; a fresh window overwrites. Unvisited windows stay UNDEFINED —
    the caller masks by visited-ness. [h_lo, h_hi) selects the head chunk
    this call emits (the f32 window blocks of ALL heads at once can
    exceed the 16 MB scoped-VMEM budget — decoder wrows 49 x 8 heads
    measured 21.94M at base, train-compile OOM)."""
    i = pl.program_id(0)
    t = pl.program_id(1)
    hs = h_hi - h_lo
    for lvl in range(n_levels):
        for hd_i in range(h_lo, h_hi):
            out_ref = out_refs[lvl * hs + (hd_i - h_lo)]
            wwp = out_ref.shape[-1]
            wrows = out_ref.shape[-2] // d  # per-HEAD window rows
            j = jrow_ref[lvl * h + hd_i, i, t]
            base = (j * stride).astype(jnp.float32)
            jprev = jrow_ref[lvl * h + hd_i, i, jnp.maximum(t - 1, 0)]
            first = jnp.logical_or(t == 0, j != jprev)
            contrib = jnp.zeros((wrows * d, wwp), jnp.float32)
            for p_i in range(p):
                c0 = ((p_i * n_levels + lvl) * h + hd_i) * NCHB
                pay = pay_ref[0, 0, c0: c0 + NCHB, :].astype(jnp.float32)
                x0 = pay[0:1]
                wx0n = pay[1:2]
                wx1n = pay[2:3]
                y0 = pay[3:4]
                wy0 = pay[4:5]
                wy1 = pay[5:6]
                attw = pay[8:9]
                g = g_ref[0, hd_i * d: (hd_i + 1) * d, :].astype(jnp.float32)
                cio = jax.lax.broadcasted_iota(jnp.int32, (wwp, ct), 0)
                xi = x0.astype(jnp.int32)
                wcol = (jnp.where(cio == xi, wx0n, 0.0)
                        + jnp.where(cio == xi + 1, wx1n, 0.0))
                rows = []
                for r in range(wrows):
                    fr = base + float(r)
                    wr = attw * (
                        jnp.where(y0 == fr, wy0, 0.0)
                        + jnp.where(y0 == fr - 1.0, wy1, 0.0)
                    )
                    rows.append(wr * g)
                a = jnp.concatenate(rows, axis=0)  # [wrows*d, ct]
                contrib = contrib + jax.lax.dot_general(
                    a.astype(compute_dtype),
                    wcol.astype(compute_dtype),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=(
                        jax.lax.Precision.HIGHEST
                        if compute_dtype == jnp.float32
                        else jax.lax.Precision.DEFAULT
                    ),
                )

            @pl.when(first)
            def _(contrib=contrib, out_ref=out_ref):
                out_ref[0, 0, 0] = contrib.astype(out_ref.dtype)

            @pl.when(jnp.logical_not(first))
            def _(contrib=contrib, out_ref=out_ref):
                out_ref[0, 0, 0] = (
                    out_ref[0, 0, 0] + contrib.astype(out_ref.dtype)
                )


def _fold_windows_hi(dwin, hh, ww, h, d, stride, wrows):
    """[b, nw, h, wrows*d, wwp] window grads -> [b, hh*ww, h*d] image."""
    b, nw, h_, rm, wwp = dwin.shape
    assert rm == wrows * d and h_ == h
    dwin = dwin.reshape(b, nw, h, wrows, d, wwp)
    hpad = (nw - 1) * stride + wrows
    img = jnp.zeros((b, hpad, h, d, wwp), jnp.float32)
    for r in range(wrows):
        img = img.at[:, r: r + (nw - 1) * stride + 1: stride].add(
            dwin[:, :, :, r].astype(jnp.float32)
        )
    img = img[:, :hh, :, :, :ww]
    return img.transpose(0, 1, 4, 2, 3).reshape(b, hh * ww, h * d)


def _fold_windows_cm(dwin, hh, ww, h, d, stride, wrows):
    """[b, nw, h, wrows*d, wwp] window grads -> CHANNEL-MAJOR
    [b, h*d, hh*ww] image (the minor dim never moves)."""
    b, nw, h_, rm, wwp = dwin.shape
    assert rm == wrows * d and h_ == h
    dwin = dwin.reshape(b, nw, h, wrows, d, wwp)
    dwin = dwin.transpose(0, 2, 4, 3, 1, 5)  # [b, h, d, wrows, nw, wwp]
    hpad = (nw - 1) * stride + wrows
    img = jnp.zeros((b, h, d, hpad, wwp), jnp.float32)
    for r in range(wrows):
        img = img.at[:, :, :, r: r + (nw - 1) * stride + 1: stride].add(
            dwin[:, :, :, r].astype(jnp.float32)
        )
    img = img[:, :, :, :hh, :ww]
    return img.reshape(b, h * d, hh * ww)


@functools.partial(
    jax.jit,
    static_argnames=(
        "spatial_shapes", "heads", "points", "stride", "halo", "cap_tile",
        "compute_dtype", "interpret", "cm",
    ),
)
def _backward_hi(
    value, spatial_shapes, sampling_locations, attention_weights, g, *,
    heads, points, stride, halo, cap_tile, compute_dtype, interpret,
    cm=False,
):
    """Scatter-free heads-inner backward: dValue via transposed window
    matmuls accumulated per query-block window (monotone j, point streams
    folded in-step), dAttw/dLoc via modified-payload passes with the
    cotangent dot reduced in-kernel. Point-major layout makes the
    per-query cotangent a CONTIGUOUS block per tile (no in-kernel
    expansion matmul). With cm=True, `value` is CHANNEL-MAJOR
    [b, h*d, k] and dValue comes back in the same layout."""
    if cm:
        if value.ndim == 4:
            value = value.reshape(value.shape[0], -1, value.shape[3])
        b, hd, k = value.shape
    else:
        if value.ndim == 4:
            value = value.reshape(value.shape[0], value.shape[1], -1)
        b, k, hd = value.shape
    h, p = heads, points
    d = hd // h
    qn = sampling_locations.shape[1]
    l = len(spatial_shapes)
    ct = cap_tile
    halos = _halos_tuple(halo, h)
    cls_of = _head_classes(halos)[1]
    pos_in = _head_classes(halos)[2]
    wrows_h = tuple(stride + hv + 1 for hv in halos)

    if cm:
        window_values = prepare_window_values_cm(
            value, spatial_shapes, heads=h, stride=stride, halo=halos,
            compute_dtype=compute_dtype,
        )
    else:
        window_values = prepare_window_values_hi(
            value, spatial_shapes, heads=h, stride=stride, halo=halos,
            compute_dtype=compute_dtype,
        )
    pay, jrow, q_pad, ntq = _prep_hi_bwd(
        sampling_locations, attention_weights, spatial_shapes,
        h, p, ct, stride, wrows_h, compute_dtype,
    )
    # per-query cotangents, contiguous per tile: [b, h*d, q_pad]
    gT = jnp.swapaxes(g.astype(jnp.float32), 1, 2)
    if q_pad != qn:
        gT = jnp.pad(gT, ((0, 0), (0, 0), (0, q_pad - qn)))

    nl = l

    # ---- pass 1: dAttw / dLoc ----
    aux_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, ntq),
        in_specs=[
            pl.BlockSpec(
                (1, 1, p * nl * h * NCHB, ct), lambda i, t, jr: (i, t, 0, 0)
            ),
            pl.BlockSpec((1, hd, ct), lambda i, t, jr: (i, 0, t)),
        ]
        + [
            (lambda li_, wwp_, rm_, pos_: pl.BlockSpec(
                (1, 1, 1, rm_, wwp_),
                lambda i, t, jr, li=li_, po=pos_: (i, jr[li, i, t], po, 0, 0),
            ))(lvl_ * h + hd_, _round_up(ww, LANE), wrows_h[hd_] * d,
               pos_in[hd_])
            for lvl_, (hh, ww) in enumerate(spatial_shapes)
            for hd_ in range(h)
        ],
        out_specs=pl.BlockSpec(
            (1, 1, p * nl * h * 4, ct), lambda i, t, jr: (i, t, 0, 0)
        ),
    )
    aux = pl.pallas_call(
        functools.partial(
            _bwd_aux_kernel_hi, d, h, p, stride, nl, ct,
            compute_dtype,
        ),
        grid_spec=aux_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b, ntq, p * nl * h * 4, ct), jnp.float32
        ),
        interpret=interpret,
    )(jrow, pay, gT, *[
        window_values[lvl][cls_of[hd_]]
        for lvl in range(nl) for hd_ in range(h)
    ])

    # ---- pass 2: dValue window gradients ----
    # head-chunked: each call's f32 window output blocks must fit the
    # 16 MB scoped-VMEM budget (with double-buffering headroom). SCA base
    # geometry (~8.2 MB) stays one call; the decoder's wrows-49 blocks
    # (12.85 MB, 21.94M scoped measured) split into two calls.
    blk_bytes = [
        sum(wrows_h[hd_] * d * _round_up(ww, LANE) * 4
            for (hh, ww) in spatial_shapes)
        for hd_ in range(h)
    ]
    # Mosaic double-buffers the revisited window outputs (~1.8x measured:
    # 9.63M of blocks -> 17.82M scoped), so budget the PRE-doubling bytes
    # at ~6.5M to stay clear of the 16M scoped limit with inputs included
    budget = int(os.environ.get("MSDA_BWD_DVAL_VMEM", 6500 * 1024))
    chunks = []
    lo = 0
    while lo < h:
        hi = lo + 1
        acc = blk_bytes[lo]
        while hi < h and acc + blk_bytes[hi] <= budget:
            acc += blk_bytes[hi]
            hi += 1
        chunks.append((lo, hi))
        lo = hi
    dwin_parts = []
    for (h_lo, h_hi) in chunks:
        dval_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, ntq),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, p * nl * h * NCHB, ct),
                    lambda i, t, jr: (i, t, 0, 0)
                ),
                pl.BlockSpec((1, hd, ct), lambda i, t, jr: (i, 0, t)),
            ],
            out_specs=[
                (lambda li_, wwp_, rm_: pl.BlockSpec(
                    (1, 1, 1, rm_, wwp_),
                    lambda i, t, jr, li=li_: (i, jr[li, i, t], 0, 0, 0),
                ))(lvl_ * h + hd_, _round_up(ww, LANE), wrows_h[hd_] * d)
                for lvl_, (hh, ww) in enumerate(spatial_shapes)
                for hd_ in range(h_lo, h_hi)
            ],
        )
        dwin_parts.append(pl.pallas_call(
            functools.partial(
                _bwd_dval_kernel_hi, d, h, p, stride, nl, ct,
                compute_dtype, h_lo, h_hi,
            ),
            grid_spec=dval_spec,
            out_shape=[
                jax.ShapeDtypeStruct(
                    (b, _n_windows(hh, stride), 1, wrows_h[hd_] * d,
                     _round_up(ww, LANE)),
                    jnp.float32,
                )
                for (hh, ww) in spatial_shapes
                for hd_ in range(h_lo, h_hi)
            ],
            interpret=interpret,
        )(jrow, pay, gT))
    # reassemble into the (lvl, head) order the fold below indexes
    dwin = [None] * (nl * h)
    for ci, (h_lo, h_hi) in enumerate(chunks):
        hs = h_hi - h_lo
        for lvl in range(nl):
            for hd_ in range(h_lo, h_hi):
                dwin[lvl * h + hd_] = (
                    dwin_parts[ci][lvl * hs + (hd_ - h_lo)]
                )

    # assemble dValue: mask never-visited windows, fold overlaps PER HEAD
    # (per-head wrows differ), then stack heads head-major
    fold = _fold_windows_cm if cm else _fold_windows_hi
    dval_parts = []
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        nw = _n_windows(hh, stride)
        per_head = []
        for hd_i in range(h):
            li = lvl * h + hd_i
            visited = jnp.any(
                jrow[li][:, :, None] == jnp.arange(nw)[None, None, :],
                axis=1,
            )  # [b, nw]
            # where(), not multiply: unvisited blocks hold garbage (NaN)
            dw = jnp.where(visited[:, :, None, None, None], dwin[li], 0.0)
            per_head.append(
                fold(dw, hh, ww, 1, d, stride, wrows_h[hd_i])
            )
        dval_parts.append(
            jnp.concatenate(per_head, axis=1 if cm else 2)
        )
    dvalue = jnp.concatenate(
        dval_parts, axis=2 if cm else 1
    ).astype(value.dtype)

    # assemble dAttw / dLoc back to the flat (l, h, p) channel layouts
    auxr = aux.reshape(b, ntq, p, nl, h, 4, ct)
    # -> [b, (l, h, p) channels, q_pad]; the ct minor keeps the transpose
    # out of tiny-minor territory
    auxr = auxr.transpose(0, 3, 4, 2, 5, 1, 6)  # [b, L, H, P, 4, ntq, ct]
    auxr = auxr.reshape(b, nl, h, p, 4, q_pad)
    scale = jnp.array([[ww, hh] for hh, ww in spatial_shapes], jnp.float32)
    dattw = jnp.swapaxes(
        auxr[:, :, :, :, 0].reshape(b, nl * h * p, q_pad), 1, 2
    )[:, :qn].astype(attention_weights.dtype)
    dlocy = auxr[:, :, :, :, 1] * scale[None, :, None, None, 1, None]
    dlocx = auxr[:, :, :, :, 2] * scale[None, :, None, None, 0, None]
    dloc = jnp.stack([dlocx, dlocy], axis=4)  # [b, L, H, P, 2, q_pad]
    dloc = jnp.swapaxes(
        dloc.reshape(b, nl * h * p * 2, q_pad), 1, 2
    )[:, :qn].astype(sampling_locations.dtype)
    return dvalue, dloc, dattw


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(1, 4, 5, 6, 7, 8, 9, 10)
)
def _hi_vjp(value, spatial_shapes, sampling_locations, attention_weights,
            heads, points, stride, halo, cap_tile, compute_dtype,
            interpret):
    return _forward_hi(
        value, spatial_shapes, sampling_locations, attention_weights,
        heads=heads, points=points, stride=stride, halo=halo,
        cap_tile=cap_tile, compute_dtype=compute_dtype,
        interpret=interpret,
    )


def _hi_fwd(value, spatial_shapes, loc, attw, heads, points, stride, halo,
            cap_tile, compute_dtype, interpret):
    out = _forward_hi(
        value, spatial_shapes, loc, attw,
        heads=heads, points=points, stride=stride, halo=halo,
        cap_tile=cap_tile, compute_dtype=compute_dtype,
        interpret=interpret,
    )
    return out, (value, loc, attw)


def _hi_bwd(spatial_shapes, heads, points, stride, halo, cap_tile,
            compute_dtype, interpret, res, g):
    value, loc, attw = res
    return _backward_hi(
        value, spatial_shapes, loc, attw, g,
        heads=heads, points=points, stride=stride, halo=halo,
        cap_tile=cap_tile, compute_dtype=compute_dtype,
        interpret=interpret,
    )


_hi_vjp.defvjp(_hi_fwd, _hi_bwd)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(1, 4, 5, 6, 7, 8, 9, 10)
)
def _hi_vjp_cm(value_cm, spatial_shapes, sampling_locations,
               attention_weights, heads, points, stride, halo, cap_tile,
               compute_dtype, interpret):
    return _forward_hi(
        None, spatial_shapes, sampling_locations, attention_weights,
        heads=heads, points=points, stride=stride, halo=halo,
        cap_tile=cap_tile, compute_dtype=compute_dtype,
        interpret=interpret, value_cm=value_cm,
    )


def _hi_fwd_cm(value_cm, spatial_shapes, loc, attw, heads, points, stride,
               halo, cap_tile, compute_dtype, interpret):
    out = _forward_hi(
        None, spatial_shapes, loc, attw,
        heads=heads, points=points, stride=stride, halo=halo,
        cap_tile=cap_tile, compute_dtype=compute_dtype,
        interpret=interpret, value_cm=value_cm,
    )
    return out, (value_cm, loc, attw)


def _hi_bwd_cm(spatial_shapes, heads, points, stride, halo, cap_tile,
               compute_dtype, interpret, res, g):
    value_cm, loc, attw = res
    return _backward_hi(
        value_cm, spatial_shapes, loc, attw, g,
        heads=heads, points=points, stride=stride, halo=halo,
        cap_tile=cap_tile, compute_dtype=compute_dtype,
        interpret=interpret, cm=True,
    )


_hi_vjp_cm.defvjp(_hi_fwd_cm, _hi_bwd_cm)


@functools.partial(
    jax.jit,
    static_argnames=(
        "spatial_shapes", "heads", "points", "stride", "halo", "cap_tile",
        "compute_dtype", "interpret",
    ),
)
def _forward_hi_lw(
    value_cm,  # [b, h*d, k] CHANNEL-MAJOR
    lw,  # [b, n, 3*nch] packed sorted (p,l,h,2) offsets | (p,l,h) weights
    ref_sorted,  # [b, n, 2] f32 frame-constant sorted reference points
    spatial_shapes,
    *,
    heads,
    points,
    stride=4,
    halo=13,
    cap_tile=512,
    compute_dtype=jnp.float32,
    interpret=False,
):
    b, hd, k = value_cm.shape
    h, p = heads, points
    d = hd // h
    qn = lw.shape[1]
    l = len(spatial_shapes)
    halos = _halos_tuple(halo, h)
    cls_of = _head_classes(halos)[1]
    pos_in = _head_classes(halos)[2]
    wrows_h = tuple(stride + hv + 1 for hv in halos)
    ct = cap_tile

    window_values = prepare_window_values_cm(
        value_cm, spatial_shapes, heads=h, stride=stride, halo=halos,
        compute_dtype=compute_dtype,
    )
    pay, jrow, q_pad, nt, ntq = _prep_hi_lw(
        lw, ref_sorted, spatial_shapes, h, p, ct, stride, wrows_h,
        compute_dtype,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec(
                (1, 1, l * h * NCH, ct), lambda i, t, jr: (i, t, 0, 0)
            )
        ]
        + [
            (lambda li_, wwp_, rm_, pos_: pl.BlockSpec(
                (1, 1, 1, rm_, wwp_),
                lambda i, t, jr, li=li_, po=pos_: (
                    i, jr[li, i, t // p], po, 0, 0),
            ))(lvl_ * h + hd_, _round_up(ww, LANE), wrows_h[hd_] * d,
               pos_in[hd_])
            for lvl_, (hh, ww) in enumerate(spatial_shapes)
            for hd_ in range(h)
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h * d, ct), lambda i, t, jr: (i, t, 0, 0)
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_hi, d, h, stride, l, ct, p, compute_dtype,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nt, h * d, ct), compute_dtype),
        interpret=interpret,
    )(jrow, pay, *[
        window_values[lvl][cls_of[hd_]]
        for lvl in range(l) for hd_ in range(h)
    ])

    out = out.reshape(b, ntq, p, h * d, ct).sum(axis=2)
    out = out.transpose(0, 1, 3, 2).reshape(b, q_pad, h * d)
    return out[:, :qn].astype(value_cm.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10)
)
def _hi_vjp_lw(value_cm, lw, ref_sorted, spatial_shapes, heads, points,
               stride, halo, cap_tile, compute_dtype, interpret):
    return _forward_hi_lw(
        value_cm, lw, ref_sorted, spatial_shapes,
        heads=heads, points=points, stride=stride, halo=halo,
        cap_tile=cap_tile, compute_dtype=compute_dtype, interpret=interpret,
    )


def _hi_fwd_lw(value_cm, lw, ref_sorted, spatial_shapes, heads, points,
               stride, halo, cap_tile, compute_dtype, interpret):
    out = _forward_hi_lw(
        value_cm, lw, ref_sorted, spatial_shapes,
        heads=heads, points=points, stride=stride, halo=halo,
        cap_tile=cap_tile, compute_dtype=compute_dtype, interpret=interpret,
    )
    return out, (value_cm, lw, ref_sorted)


def _decode_lw(lw, ref_sorted, l, h, p):
    """lw (p, l, h) packed channels -> flat (l, h, p) loc/attw (the layout
    `_backward_hi` consumes)."""
    b, n, _ = lw.shape
    nch = l * h * p
    off = lw[..., : 2 * nch].astype(jnp.float32).reshape(b, n, p, l, h, 2)
    loc = off + ref_sorted.astype(jnp.float32)[:, :, None, None, None, :]
    loc = loc.transpose(0, 1, 3, 4, 2, 5).reshape(b, n, 2 * nch)
    aw = lw[..., 2 * nch:].astype(jnp.float32).reshape(b, n, p, l, h)
    aw = aw.transpose(0, 1, 3, 4, 2).reshape(b, n, nch)
    return loc, aw


def _hi_bwd_lw(spatial_shapes, heads, points, stride, halo, cap_tile,
               compute_dtype, interpret, res, g):
    value_cm, lw, ref_sorted = res
    l = len(spatial_shapes)
    h, p = heads, points
    nch = l * h * p
    b, n, _ = lw.shape
    loc, aw = _decode_lw(lw, ref_sorted, l, h, p)
    dval, dloc, dattw = _backward_hi(
        value_cm, spatial_shapes, loc, aw, g,
        heads=heads, points=points, stride=stride, halo=halo,
        cap_tile=cap_tile, compute_dtype=compute_dtype,
        interpret=interpret, cm=True,
    )
    # (l, h, p) flat cotangents -> the packed (p, l, h) lw columns;
    # d(ref) is dropped (frame geometry, no parameters behind it)
    doff = dloc.reshape(b, n, l, h, p, 2).transpose(0, 1, 4, 2, 3, 5)
    dw = dattw.reshape(b, n, l, h, p).transpose(0, 1, 4, 2, 3)
    dlw = jnp.concatenate(
        [doff.reshape(b, n, 2 * nch), dw.reshape(b, n, nch)], axis=-1
    ).astype(lw.dtype)
    return dval, dlw, jnp.zeros_like(ref_sorted)


_hi_vjp_lw.defvjp(_hi_fwd_lw, _hi_bwd_lw)


def ms_deform_attn_hi_lw(
    value_cm,  # [b, h*d, k] CHANNEL-MAJOR
    lw,  # [b, n, 3*nch] packed (p, l, h, 2) offsets | (p, l, h) weights
    ref_sorted,  # [b, n, 2] f32 sorted reference points (frame-constant)
    spatial_shapes,
    *,
    heads,
    points,
    stride=4,
    halo=13,
    cap_tile=512,
    compute_dtype=jnp.float32,
):
    """`ms_deform_attn_hi` from the PACKED sorted projection tensor.

    Same kernel and numerics as the flat-loc entry (sampling location =
    packed offset + ref, bilinear in f32), but the payload prep consumes
    the sort gather's output directly: no decoded [b, n, 2*nch] f32
    location tensor, no separate weight cast, one relayout instead of
    four (~half the per-layer prep HBM traffic at base SCA shapes —
    the round-4 encoder bisection's unaccounted ~6 ms/layer,
    BENCH_NOTES round 5). Differentiable in (value_cm, lw); the
    reference points get zero cotangent (camera geometry, no params)."""
    if isinstance(halo, list):
        halo = tuple(halo)
    try:
        interpret = jax.devices()[0].platform != "tpu"
    except Exception:  # pragma: no cover
        interpret = True
    if value_cm.ndim == 4:
        value_cm = value_cm.reshape(value_cm.shape[0], -1, value_cm.shape[3])
    return _hi_vjp_lw(
        value_cm, lw, jax.lax.stop_gradient(ref_sorted), spatial_shapes,
        heads, points, stride, halo, cap_tile, compute_dtype, interpret,
    )


def ms_deform_attn_hi(
    value,
    spatial_shapes,
    sampling_locations,  # FLAT [b, q', L*H*P*2], channels (l, h, p, 2)
    attention_weights,  # FLAT [b, q', L*H*P]
    *,
    heads,
    points,
    stride=4,
    halo=13,
    cap_tile=512,
    compute_dtype=jnp.float32,
    value_cm=None,  # [b, h*d, k] CHANNEL-MAJOR alternative to `value`
):
    """Heads-inner fused windowed TPU deformable attention (see module
    docstring). Exact (vs `ms_deform_attn_jnp`) whenever each query
    block's sampled rows — per HEAD, across its points — fit that head's
    stride+halo_h+1-row window; audit with `window_drop_mass_hi`.
    `halo` is a scalar or a per-head tuple: the grid-init offset bias is
    one-directional per head, so per-head halos cut the window matmul M
    dim on the heads whose row spread is small (heads sharing a halo
    share one window array). Differentiable (scatter-free Pallas
    backward). Off-TPU the kernels run interpreted (tests). Pass
    `value_cm` (channel-major [b, h*d, k], value=None) when the caller's
    projection emits it directly — the window prep then never relayouts
    the minor dim (~7.5 ms/layer cheaper at base SCA scale)."""
    if isinstance(halo, list):
        halo = tuple(halo)
    try:
        interpret = jax.devices()[0].platform != "tpu"
    except Exception:  # pragma: no cover
        interpret = True
    if value_cm is not None:
        assert value is None
        if value_cm.ndim == 4:
            value_cm = value_cm.reshape(
                value_cm.shape[0], -1, value_cm.shape[3])
        return _hi_vjp_cm(
            value_cm, spatial_shapes, sampling_locations,
            attention_weights, heads, points, stride, halo, cap_tile,
            compute_dtype, interpret,
        )
    if value.ndim == 4:
        value = value.reshape(value.shape[0], value.shape[1], -1)
    return _hi_vjp(
        value, spatial_shapes, sampling_locations, attention_weights,
        heads, points, stride, halo, cap_tile, compute_dtype, interpret,
    )
