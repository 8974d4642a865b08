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

The backward pass reuses the XLA patch-gather path via `jax.custom_vjp`
(compile-once training; backward is scatter-add dominated, which XLA
handles adequately at training batch sizes).

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
            ct: int, compute_dtype, jrow_ref, pay_ref, *refs):
    """One (batch*head, item-supertile) step: ALL levels fused and `tiles`
    item-tiles per step — the out block is written once per supertile and
    the fixed per-step cost (index maps, DMA bookkeeping) is amortised
    over tiles*levels matmuls.

    jrow_ref: scalar-prefetch [L, bh, nt] window index per (level, tile).
    pay_ref:  [1, L, 8, tiles*CT] f32 — per level, channels (x0, wx0, wx1,
              y0, wy0, wy1, 0, 0); indices as exact f32 integers, y0
              GLOBAL image row.
    refs: L*tiles window-block refs [1, 1, wrows*D, WWp_l] ordered
          (level-major, sub-tile minor), then out_ref [1, D, tiles*CT].
    """
    i = pl.program_id(0)
    t = pl.program_id(1)
    val_refs = refs[: n_levels * tiles]
    out_ref = refs[n_levels * tiles]

    for s in range(tiles):
        acc = jnp.zeros((d, ct), jnp.float32)
        for lvl in range(n_levels):
            acc = _level_accum(
                pay_ref[0, lvl, :, s * ct : (s + 1) * ct],
                val_refs[lvl * tiles + s][0, 0],
                jrow_ref[lvl, i, t * tiles + s],
                wrows, d, stride, compute_dtype, acc,
            )
        out_ref[0, :, s * ct : (s + 1) * ct] = acc.astype(out_ref.dtype)


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


def _tile_windows(y0i, nt, ct, stride, wrows, nw):
    """Per-tile window index. The window [j*stride, j*stride + wrows - 1]
    must cover rows [lo, hi+1] (both bilinear corners of every item); when
    the tile's spread fits, clamp the centered choice into the covering
    range so the drop mass is exactly zero."""
    y0t = y0i.reshape(y0i.shape[0], nt, ct)
    lo = y0t.min(-1)
    hi = y0t.max(-1)
    center = (lo + hi + 1 - wrows) // 2  # ideal window start row
    j_ideal = (center + stride // 2) // stride
    jmin = -((wrows - 2 - hi) // stride)  # ceil((hi+2-wrows)/stride)
    jmax = jnp.floor_divide(lo, stride)
    j = jnp.clip(jnp.clip(j_ideal, jmin, jmax), 0, nw - 1)
    return j.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "spatial_shapes",
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
    stride=8,
    halo=8,
    cap_tile=256,
    tiles=2,
    compute_dtype=jnp.float32,
    interpret=False,
):
    """Items ([b, q, h, l, p] flattened to (q, p) per batch*head) must be
    row-coherent within each `cap_tile` chunk for lossless sampling; see
    module docstring."""
    b, k, h, d = value.shape
    _, q, _, l, p, _ = sampling_locations.shape
    bh, n = b * h, q * p
    ct = cap_tile
    n_pad = _round_up(n, ct)
    nt = n_pad // ct
    wrows = stride + halo + 1

    if window_values is None:
        window_values = prepare_window_values(
            value, spatial_shapes, stride=stride, halo=halo,
            compute_dtype=compute_dtype,
        )

    # [b, q, h, l, p, *] -> [bh, n, l, *]
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
            (1, d, tiles * ct), lambda i, t, jr: (i, 0, t)
        ),
    )
    vals = [
        window_values[lvl]
        for lvl in range(nl)
        for _ in range(tiles)
    ]
    out = pl.pallas_call(
        functools.partial(
            _kernel, wrows, d, stride, nl, tiles, ct, compute_dtype
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, d, n_pad), compute_dtype),
        interpret=interpret,
    )(jrow, pay, *vals)

    out = out[:, :, :n]
    # reduce points per query (dense, no scatter), restore [B, Q, H*D]
    out = out.reshape(b, h, d, q, p).sum(-1, dtype=jnp.float32)
    return out.transpose(0, 3, 1, 2).reshape(b, q, h * d).astype(value.dtype)


def window_drop_mass(
    spatial_shapes, sampling_locations, attention_weights, *,
    stride=8, halo=8, cap_tile=256,
):
    """Audit: per-level total attention weight lost to out-of-window items
    (0.0 = the kernel is exact vs the oracle for this input order)."""
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
        dropped.append(float(lost.sum()))
    return dropped


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5, 6, 7, 8))
def _pallas_vjp(
    value,
    spatial_shapes,
    sampling_locations,
    attention_weights,
    stride,
    halo,
    cap_tile,
    compute_dtype,
    interpret,
):
    return _forward(
        value,
        spatial_shapes,
        sampling_locations,
        attention_weights,
        stride=stride,
        halo=halo,
        cap_tile=cap_tile,
        compute_dtype=compute_dtype,
        interpret=interpret,
    )


def _fwd(value, spatial_shapes, loc, attw, stride, halo, cap_tile,
         compute_dtype, interpret):
    out = _forward(
        value, spatial_shapes, loc, attw,
        stride=stride, halo=halo, cap_tile=cap_tile,
        compute_dtype=compute_dtype, interpret=interpret,
    )
    return out, (value, loc, attw)


def _bwd(spatial_shapes, stride, halo, cap_tile, compute_dtype, interpret,
         res, g):
    from bevformer_tpu.kernels.msda import ms_deform_attn_patch

    value, loc, attw = res
    _, vjp = jax.vjp(
        lambda v, l_, w_: ms_deform_attn_patch(v, spatial_shapes, l_, w_),
        value,
        loc,
        attw,
    )
    return vjp(g)


_pallas_vjp.defvjp(_fwd, _bwd)


def ms_deform_attn_pallas(
    value,
    spatial_shapes,
    sampling_locations,
    attention_weights,
    *,
    stride=8,
    halo=8,
    cap_tile=512,
    compute_dtype=jnp.float32,
):
    """Fused windowed TPU deformable attention (see module docstring).

    Exact (vs `ms_deform_attn_jnp`) whenever each 256-item tile's sampled
    rows fit its stride+halo+1-row window — guaranteed for row-coherent
    item orders with offsets within the halo; audit with
    `window_drop_mass`. Differentiable (backward = XLA patch gather).

    Off-TPU (unit tests) the kernel runs in interpreter mode."""
    try:
        interpret = jax.devices()[0].platform != "tpu"
    except Exception:  # pragma: no cover
        interpret = True
    return _pallas_vjp(
        value,
        spatial_shapes,
        sampling_locations,
        attention_weights,
        stride,
        halo,
        cap_tile,
        compute_dtype,
        interpret,
    )
