"""Fused Pallas TPU kernel for DCNv2 (modulated deformable conv) sampling.

Replaces the bilinear-gather im2col in `models/resnet.py::ModulatedDeformConv`
(reference semantics: mmcv CUDA `DCNv2`, used by the R101-DCN backbone,
`/root/reference/projects/configs/bevformer/bevformer_base.py:52-53`).

Why: the XLA gather path is gather-engine bound (~25 GB/s of slice bytes,
BENCH_NOTES cost model) — measured 485 ms of the 543 ms base backbone. This
kernel is the DCN specialisation of the windowed multi-hot design in
`kernels/msda_pallas.py`:

  * Items are output pixels in raster order — naturally row-coherent, no
    sort needed. A `cap_tile` tile spans ~ceil(ct/OW) consecutive rows.
  * All 9 taps of one pixel tile share one VMEM-resident row-window block
    of the input; each tap builds its own column multi-hot `wcol[wwp, ct]`
    (taps have independent offsets in DCNv2) and contracts on the MXU,
    then combines rows with register compares. The 4-corner bilinear +
    modulation mask are folded into the column/row weights exactly as the
    attention weights are in msda_pallas.
  * Channels are processed in `Cc`-sized chunks so the [wrows*Cc, ct]
    matmul output fits VMEM (~16 MB/core).
  * Vertical offsets are clipped to ±clip_y so every tile's rows fit its
    window — the ONLY deviation from reference DCNv2 semantics (horizontal
    offsets are exact: windows span the full padded width). clip_y=6 at
    1/16 resolution is ±96 input pixels; trained DCN offsets are far
    smaller. The backward pass differentiates the same clipped formulation.

Validated against the gather path in tests/test_dcn_pallas.py (interpret
mode on CPU; exact for offsets within the clip).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bevformer_tpu.kernels.msda_pallas import _round_up, _tile_windows

LANE = 128
K = 3  # kernel size (3x3, the only size the reference backbone uses)


def _wrows_for(ct: int, ow: int, conv_stride: int, clip_y: float,
               stride: int) -> int:
    """Window rows needed so every ct-item tile's bilinear rows fit.

    Tile pixel rows span ceil(ct/ow) output rows = conv_stride * that in
    input rows; taps add +-1, offsets +-clip, the bottom bilinear corner
    +1, window-start quantisation +stride-1, +1 safety margin."""
    row_span = conv_stride * (math.ceil(ct / ow) + 1)
    # no stride round-up: the window builders stack whole stride-row
    # groups PLUS one partial (wrows % stride)-row group (same unrounded
    # construction as msda_hi.prepare_window_values_*). Every surplus row
    # is pure MXU waste — the rc kernel is ~90% matmul-bound
    # (tools/bench_dcn_probe.py REPS=64: full 3.05 ms/block real vs a
    # ~2.7 ms matmul floor at wrows 20; 20 -> 18 cuts 10%).
    return row_span + 2 + 2 * math.ceil(clip_y) + 2 + (stride - 1) + 1


def _wrows_tap(ct: int, ow: int, conv_stride: int, clip_y: float,
               stride: int) -> int:
    """Per-TAP-ROW-CLASS window rows: the 3x3 taps' +-1 vertical span is
    NOT charged to the window — taps sharing a ky row (class ky in
    {0,1,2}) get their own window index (the DCN analogue of msda_hi's
    per-head halo classes). Cuts the matmul M dim by 2 of ~18 rows at
    stage-3 shapes; the window arrays are shared (one prepare), only the
    per-class jrow differs."""
    row_span = conv_stride * (math.ceil(ct / ow) + 1)
    return row_span + 2 * math.ceil(clip_y) + 2 + (stride - 1) + 1


def prepare_dcn_windows(x, *, stride: int, wrows: int, cc: int,
                        compute_dtype=jnp.bfloat16):
    """[B, H, W, C] -> [B, nw, C//cc, wrows*cc, wwp] overlapping row-window
    blocks; window j holds input rows [j*stride, j*stride + wrows)."""
    b, h, w, c = x.shape
    assert c % cc == 0, (c, cc)
    wwp = _round_up(w, LANE)
    nw = max(-(-h // stride), 1)
    g = wrows // stride  # full stride-row groups per window
    rem = wrows % stride  # plus one partial group of rem rows
    hpad = (nw + g) * stride  # >= (nw - 1) * stride + wrows
    xp = jnp.pad(
        x.astype(compute_dtype),
        ((0, 0), (0, hpad - h), (0, wwp - w), (0, 0)),
    )
    # ONE transpose with a big minor (wwp), then whole stride-row-group
    # stacking: window j = groups j .. j+g-1 plus the first rem rows of
    # group j+g (unrounded wrows — every surplus row is MXU waste in the
    # rc kernel; same construction as msda_hi.prepare_window_values_*)
    img = xp.reshape(b, hpad, wwp, c // cc, cc)
    t = img.transpose(0, 3, 1, 4, 2)  # [b, ncc, hpad, cc, wwp]
    tg = t.reshape(b, c // cc, hpad // stride, stride, cc, wwp)
    tgf = tg.reshape(b, c // cc, hpad // stride, stride * cc, wwp)
    parts = [tgf[:, :, o : o + nw] for o in range(g)]
    if rem:
        parts.append(
            tg[:, :, g : g + nw, :rem].reshape(b, c // cc, nw, rem * cc, wwp)
        )
    wins = jnp.concatenate(
        [p.reshape(b, c // cc, nw, -1, wwp) for p in parts], axis=3
    )  # [b, ncc, nw, wrows*cc, wwp]
    return wins.transpose(0, 2, 1, 3, 4)  # [b, nw, ncc, wrows*cc, wwp]


def _kernel(wrows, ncc, cc, stride, compute_dtype,
            jrow_ref, pay_ref, val_ref, out_ref):
    """One (batch, pixel-tile) step with ALL 9 taps inside (the DCN
    analogue of the heads-inner msda redesign, `kernels/msda_hi.py`):
    9x fewer grid steps than the original (b, nt, tap) grid, so the fixed
    per-step block plumbing amortises and Mosaic can overlap one tap's
    row-combine (VPU) with the next tap's window matmul (MXU).

    jrow_ref: scalar-prefetch [b, nt] window index per tile.
    pay_ref:  [1, 72, CT] f32 — per tap 8 channels (x0, wx0*m, wx1*m, y0,
              wy0, wy1, 0, 0).
    val_ref:  [1, 1, ncc, wrows*cc, wwp] — this tile's window block
              (shared by all taps).
    out_ref:  [1, 9*C, CT] — sampled*mask, rows (tap, channel).
    """
    i = pl.program_id(0)
    t = pl.program_id(1)
    j = jrow_ref[i, t]
    wwp = val_ref.shape[-1]
    ct = pay_ref.shape[-1]
    c = ncc * cc

    base = (j * stride).astype(jnp.float32)
    cio = jax.lax.broadcasted_iota(jnp.int32, (wwp, ct), 0)
    # f32 mode must ask for HIGHEST or the MXU silently truncates the
    # operands to bf16 (same pitfall handled in msda_pallas._level_accum)
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    for tap in range(K * K):
        pay = pay_ref[0, tap * 8 : tap * 8 + 8]
        x0 = pay[0:1]
        wx0 = pay[1:2]
        wx1 = pay[2:3]
        y0 = pay[3:4]
        wy0 = pay[4:5]
        wy1 = pay[5:6]
        xi = x0.astype(jnp.int32)
        wcol = (
            jnp.where(cio == xi, wx0, 0.0)
            + jnp.where(cio == xi + 1, wx1, 0.0)
        ).astype(compute_dtype)
        # row weights shared by every channel chunk — hoist off the cc loop
        wr = [
            jnp.where(y0 == base + float(r), wy0, 0.0)
            + jnp.where(y0 == base + float(r) - 1.0, wy1, 0.0)
            for r in range(wrows)
        ]
        for cci in range(ncc):
            val = val_ref[0, 0, cci]  # [wrows*cc, wwp]
            tm = jnp.dot(
                val, wcol, preferred_element_type=jnp.float32,
                precision=precision,
            )  # [wrows*cc, ct]
            acc = jnp.zeros((cc, ct), jnp.float32)
            for r in range(wrows):
                acc = acc + wr[r] * tm[r * cc : (r + 1) * cc]
            out_ref[0, tap * c + cci * cc : tap * c + (cci + 1) * cc, :] = (
                acc.astype(out_ref.dtype)
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "conv_stride", "clip_y", "cap_tile", "stride", "cc",
        "compute_dtype", "interpret",
    ),
)
def _forward(
    x, off_y, off_x, mask, *,
    conv_stride=1, clip_y=6.0, cap_tile=512, stride=4, cc=64,
    compute_dtype=jnp.bfloat16, interpret=False,
):
    """x [B,H,W,C]; off_y/off_x/mask [B,OH,OW,9] -> [B, 9*C, OH*OW]
    (rows ordered tap-major then channel — im2col order)."""
    b, h, w, c = x.shape
    _, oh, ow, _ = off_y.shape
    n = oh * ow
    # strided convs double the input-row span per tile, and wide channel
    # counts grow the [9*C, ct] out block — shrink the tile so window +
    # out blocks (double-buffered) stay within the ~16 MB VMEM budget
    ct = min(cap_tile, 256) if (conv_stride > 1 or c >= 512) else cap_tile
    n_pad = _round_up(n, ct)
    nt = n_pad // ct
    wrows = _wrows_for(ct, ow, conv_stride, clip_y, stride)
    nw = max(-(-h // stride), 1)
    ncc = c // cc

    # sampling coordinates (pixel space): y = oy*cs - 1 + ky + off_y.
    # Everything is computed TAP-MAJOR [b, 9, n_pad] so the payload stack
    # is layout-clean: the old [b, n, 6, 9] -> [b, 9, 6, n] relayout was a
    # tiny-minor (9) transpose of 6 channels; here only the three raw
    # inputs transpose (5x less traffic) and all math has a big minor.
    ybase = jnp.repeat(
        jnp.arange(oh, dtype=jnp.float32) * conv_stride - 1.0, ow
    )  # [n]
    xbase = jnp.tile(
        jnp.arange(ow, dtype=jnp.float32) * conv_stride - 1.0, oh
    )  # [n]
    ky, kx = jnp.meshgrid(
        jnp.arange(K, dtype=jnp.float32),
        jnp.arange(K, dtype=jnp.float32),
        indexing="ij",
    )
    oyc = jnp.clip(off_y.astype(jnp.float32), -clip_y, clip_y)
    oy9 = oyc.reshape(b, n, K * K).transpose(0, 2, 1)  # [b, 9, n]
    ox9 = off_x.astype(jnp.float32).reshape(b, n, K * K).transpose(0, 2, 1)
    m = mask.astype(jnp.float32).reshape(b, n, K * K).transpose(0, 2, 1)
    py = ybase[None, None, :] + ky.reshape(-1)[None, :, None] + oy9
    px = xbase[None, None, :] + kx.reshape(-1)[None, :, None] + ox9
    if n_pad != n:
        py = jnp.pad(py, ((0, 0), (0, 0), (0, n_pad - n)), mode="edge")
        px = jnp.pad(px, ((0, 0), (0, 0), (0, n_pad - n)), mode="edge")
        m = jnp.pad(m, ((0, 0), (0, 0), (0, n_pad - n)))

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    tx = px - x0
    ty = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    vx0 = (x0i >= 0) & (x0i < w)
    vx1 = (x0i >= -1) & (x0i < w - 1)
    vy0 = (y0i >= 0) & (y0i < h)
    vy1 = (y0i >= -1) & (y0i < h - 1)
    x0c = jnp.clip(x0i, -1, w - 1).astype(jnp.float32)

    payload = jnp.stack(
        [
            x0c,
            m * (1.0 - tx) * vx0,
            m * tx * vx1,
            y0,
            (1.0 - ty) * vy0,
            ty * vy1,
        ],
        axis=2,
    )  # [b, 9, 6, n_pad]
    payload = jnp.pad(payload, ((0, 0), (0, 0), (0, 2), (0, 0)))  # ch -> 8
    payload = payload.reshape(b, K * K * 8, n_pad)  # taps stacked

    # per-tile window index: cover min/max bilinear rows over the tile's
    # ct pixels x 9 taps. _tile_windows only min/max-reduces per tile, so
    # feed it the per-pixel tap-extremes side by side (order-invariant).
    ylo = y0i.min(axis=1).reshape(b, nt, ct)
    yhi = y0i.max(axis=1).reshape(b, nt, ct)
    jrow = _tile_windows(
        jnp.concatenate([ylo, yhi], axis=-1).reshape(b, nt * 2 * ct),
        nt, 2 * ct, stride, wrows, nw,
    )

    wins = prepare_dcn_windows(
        x, stride=stride, wrows=wrows, cc=cc, compute_dtype=compute_dtype
    )
    wwp = wins.shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, K * K * 8, ct), lambda i, t, jr: (i, 0, t)),
            pl.BlockSpec(
                (1, 1, ncc, wrows * cc, wwp),
                lambda i, t, jr: (i, jr[i, t], 0, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, K * K * c, ct), lambda i, t, jr: (i, 0, t)
        ),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, wrows, ncc, cc, stride, compute_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, K * K * c, n_pad), compute_dtype),
        interpret=interpret,
    )(jrow, payload, wins)
    return out[:, :, :n]


def prepare_dcn_windows_flat(x, *, stride: int, wrows: int, cc: int,
                             compute_dtype=jnp.bfloat16):
    """[B, H, W, C] -> [B, nw, C//cc, cc, wrows*wwp] FLAT row-window
    blocks: channel-chunk rows, (window row, column) flattened in the
    minor dim — the layout the 2D-one-hot kernel (`_kernel_conv`)
    contracts in ONE [cc, wrows*wwp] x [wrows*wwp, ct] matmul."""
    b, h, w, c = x.shape
    assert c % cc == 0, (c, cc)
    wwp = _round_up(w, LANE)
    nw = max(-(-h // stride), 1)
    g = wrows // stride
    rem = wrows % stride  # unrounded wrows: one partial trailing group
    hpad = (nw + g) * stride
    xp = jnp.pad(
        x.astype(compute_dtype),
        ((0, 0), (0, hpad - h), (0, wwp - w), (0, 0)),
    )
    # channel-major image, rows x cols flat in the minor dims
    img = xp.reshape(b, hpad, wwp, c // cc, cc)
    t = img.transpose(0, 3, 4, 1, 2)  # [b, ncc, cc, hpad, wwp]
    tg = t.reshape(b, c // cc, cc, hpad // stride, stride, wwp)
    tgf = tg.reshape(b, c // cc, cc, hpad // stride, stride * wwp)
    parts = [tgf[:, :, :, o : o + nw] for o in range(g)]
    if rem:
        parts.append(
            tg[:, :, :, g : g + nw, :rem].reshape(
                b, c // cc, cc, nw, rem * wwp
            )
        )
    wins = jnp.concatenate(
        [p.reshape(b, c // cc, cc, nw, -1) for p in parts], axis=4
    )  # [b, ncc, cc, nw, wrows*wwp]
    return wins.transpose(0, 3, 1, 2, 4)  # [b, nw, ncc, cc, wrows*wwp]


def _kernel_conv_rc(wrows, ncc, cc, stride, compute_dtype, n_cls,
                    jrow_ref, pay_ref, *refs):
    """Conv-folded kernel, ROW-COMBINE variant: per tap, column-one-hot
    matmul [wrows*cc, wwp] x [wwp, ct] then a VPU row combine (the
    original `_kernel` structure); sampled rows land in `smp_ref` and one
    resident-weight matmul emits [Cout, ct]. Kept selectable
    (DCN_ALGO=rc) against the wbig variant below: on v5e the row combine
    hides behind the MXU (measured 146 vs 158 ms full-backbone), so this
    is the shipped default.

    n_cls=3: per-TAP-ROW-CLASS windows (refs hold one window-block view
    per ky class, all slicing the SAME prepared array at that class's
    jrow[cls, i, t]) — the taps' +-1 vertical span is not charged to the
    window, so the matmul M dim shrinks by 2 rows. n_cls=1: one shared
    window (jrow [1, b, nt])."""
    i = pl.program_id(0)
    t = pl.program_id(1)
    val_refs = refs[:n_cls]
    w_ref, out_ref, smp_ref = refs[n_cls], refs[n_cls + 1], refs[n_cls + 2]
    wwp = val_refs[0].shape[-1]
    ct = pay_ref.shape[-1]
    c = ncc * cc

    cio = jax.lax.broadcasted_iota(jnp.int32, (wwp, ct), 0)
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    for tap in range(K * K):
        cls = tap // K if n_cls == K else 0
        val_ref = val_refs[cls]
        base = (jrow_ref[cls, i, t] * stride).astype(jnp.float32)
        pay = pay_ref[0, tap * 8 : tap * 8 + 8]
        x0 = pay[0:1]
        wx0 = pay[1:2]
        wx1 = pay[2:3]
        y0 = pay[3:4]
        wy0 = pay[4:5]
        wy1 = pay[5:6]
        xi = x0.astype(jnp.int32)
        wcol = (
            jnp.where(cio == xi, wx0, 0.0)
            + jnp.where(cio == xi + 1, wx1, 0.0)
        ).astype(compute_dtype)
        wr = [
            jnp.where(y0 == base + float(r), wy0, 0.0)
            + jnp.where(y0 == base + float(r) - 1.0, wy1, 0.0)
            for r in range(wrows)
        ]
        for cci in range(ncc):
            val = val_ref[0, 0, cci]  # [wrows*cc, wwp]
            tm = jnp.dot(
                val, wcol, preferred_element_type=jnp.float32,
                precision=precision,
            )  # [wrows*cc, ct]
            acc = jnp.zeros((cc, ct), jnp.float32)
            for r in range(wrows):
                acc = acc + wr[r] * tm[r * cc : (r + 1) * cc]
            smp_ref[tap * c + cci * cc : tap * c + (cci + 1) * cc, :] = (
                acc.astype(compute_dtype)
            )
    out_ref[0] = jnp.dot(
        w_ref[...], smp_ref[...],
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(out_ref.dtype)


def _kernel_conv(wrows, ncc, cc, stride, compute_dtype,
                 jrow_ref, pay_ref, val_ref, w_ref, out_ref,
                 smp_ref, wbig_ref):
    """_kernel with (a) the 3x3 conv CONTRACTION folded in and (b) the
    bilinear row-combine folded INTO the sampling matmul via a 2D one-hot.

    (a) sampled rows land in VMEM scratch `smp_ref` [9*C, ct] and ONE big
    matmul with the resident conv weight `w_ref` [Cout, 9*C] writes
    [Cout, ct] — the [b, 9*C, n] im2col (9x the input, 160 MB per stage-2
    block at base) never round-trips HBM and the external fp32 einsum it
    fed disappears. Extra MXU flops = exactly the conv.

    (b) per tap, the FULL bilinear weight over the (row, column) window —
    `wbig[r*wwp + col, j] = wr[r, j] * wcol[col, j]` — is built by one
    outer-product VPU pass per window row into `wbig_ref`
    [wrows*wwp, ct], then contracted against the FLAT window block
    `val_ref[.., cc, wrows*wwp]` in ONE MXU matmul per channel chunk.
    Identical flops to the old column-matmul (wrows*cc x wwp x ct ==
    cc x wrows*wwp x ct) but the per-row VPU combine — which dominated at
    ~2.5 ops per tmat element, the measured DCN wall — is gone, and
    cc=128 fills the MXU M dimension."""
    i = pl.program_id(0)
    t = pl.program_id(1)
    j = jrow_ref[0, i, t]
    nflat = val_ref.shape[-1]
    wwp = nflat // wrows
    ct = pay_ref.shape[-1]
    c = ncc * cc

    base = (j * stride).astype(jnp.float32)
    cio = jax.lax.broadcasted_iota(jnp.int32, (wwp, ct), 0)
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    for tap in range(K * K):
        pay = pay_ref[0, tap * 8 : tap * 8 + 8]
        x0 = pay[0:1]
        wx0 = pay[1:2]
        wx1 = pay[2:3]
        y0 = pay[3:4]
        wy0 = pay[4:5]
        wy1 = pay[5:6]
        xi = x0.astype(jnp.int32)
        wcol = jnp.where(cio == xi, wx0, 0.0) + jnp.where(
            cio == xi + 1, wx1, 0.0
        )
        for r in range(wrows):
            fr = base + float(r)
            wr = jnp.where(y0 == fr, wy0, 0.0) + jnp.where(
                y0 == fr - 1.0, wy1, 0.0
            )  # [1, ct]
            wbig_ref[r * wwp : (r + 1) * wwp, :] = (wr * wcol).astype(
                compute_dtype
            )
        for cci in range(ncc):
            val = val_ref[0, 0, cci]  # [cc, wrows*wwp]
            acc = jnp.dot(
                val, wbig_ref[...], preferred_element_type=jnp.float32,
                precision=precision,
            )  # [cc, ct]
            smp_ref[tap * c + cci * cc : tap * c + (cci + 1) * cc, :] = (
                acc.astype(compute_dtype)
            )
    out_ref[0] = jnp.dot(
        w_ref[...], smp_ref[...],
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "conv_stride", "clip_y", "cap_tile", "stride", "cc",
        "compute_dtype", "interpret", "algo",
    ),
)
def _forward_conv(
    x, off_y, off_x, mask, weight, *,
    conv_stride=1, clip_y=6.0, cap_tile=512, stride=4, cc=64,
    compute_dtype=jnp.bfloat16, interpret=False, algo="rc",
):
    """Deformable im2col + conv contraction in one kernel.

    x [B,H,W,C]; off_y/off_x/mask [B,OH,OW,9]; weight [9*C, Cout] (im2col
    row order: tap-major then channel, matching `_forward`'s output rows)
    -> [B, Cout, OH*OW]. algo: 'rc' (column matmul + VPU row combine) or
    'wbig' (flat-window 2D-one-hot matmul)."""
    b, h, w, c = x.shape
    _, oh, ow, _ = off_y.shape
    cout = weight.shape[1]
    n = oh * ow
    # wide channel counts / strided convs grow the window + weight + smp
    # blocks: ct=128 keeps stage-4 (C=512, conv_stride=2) under the 16 MB
    # scoped-VMEM budget (ct=256 measured 19.25M OOM at compile)
    ct = min(cap_tile, 128) if (conv_stride > 1 or c >= 512) else cap_tile
    n_pad = _round_up(n, ct)
    nt = n_pad // ct
    # per-tap-row-class windows (rc only): taps sharing a ky row get their
    # own window index, so the +-1 tap span drops out of wrows. K window
    # blocks (double-buffered) don't fit the 16 MB scoped-VMEM budget at
    # wide-channel / strided shapes (stage-4 C=512 measured 16.45M OOM at
    # compile even at ct=128) — those blocks fall back to one shared window.
    n_cls = K if (
        algo == "rc"
        and os.environ.get("DCN_TAPCLS", "1") == "1"
        and conv_stride == 1
        and c < 512
    ) else 1
    if n_cls == K:
        wrows = _wrows_tap(ct, ow, conv_stride, clip_y, stride)
    else:
        wrows = _wrows_for(ct, ow, conv_stride, clip_y, stride)
    nw = max(-(-h // stride), 1)
    ncc = c // cc

    ybase = jnp.repeat(
        jnp.arange(oh, dtype=jnp.float32) * conv_stride - 1.0, ow
    )
    xbase = jnp.tile(
        jnp.arange(ow, dtype=jnp.float32) * conv_stride - 1.0, oh
    )
    ky, kx = jnp.meshgrid(
        jnp.arange(K, dtype=jnp.float32),
        jnp.arange(K, dtype=jnp.float32),
        indexing="ij",
    )
    oyc = jnp.clip(off_y.astype(jnp.float32), -clip_y, clip_y)
    oy9 = oyc.reshape(b, n, K * K).transpose(0, 2, 1)
    ox9 = off_x.astype(jnp.float32).reshape(b, n, K * K).transpose(0, 2, 1)
    m = mask.astype(jnp.float32).reshape(b, n, K * K).transpose(0, 2, 1)
    py = ybase[None, None, :] + ky.reshape(-1)[None, :, None] + oy9
    px = xbase[None, None, :] + kx.reshape(-1)[None, :, None] + ox9
    if n_pad != n:
        py = jnp.pad(py, ((0, 0), (0, 0), (0, n_pad - n)), mode="edge")
        px = jnp.pad(px, ((0, 0), (0, 0), (0, n_pad - n)), mode="edge")
        m = jnp.pad(m, ((0, 0), (0, 0), (0, n_pad - n)))

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    tx = px - x0
    ty = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    vx0 = (x0i >= 0) & (x0i < w)
    vx1 = (x0i >= -1) & (x0i < w - 1)
    vy0 = (y0i >= 0) & (y0i < h)
    vy1 = (y0i >= -1) & (y0i < h - 1)
    x0c = jnp.clip(x0i, -1, w - 1).astype(jnp.float32)

    payload = jnp.stack(
        [
            x0c,
            m * (1.0 - tx) * vx0,
            m * tx * vx1,
            y0,
            (1.0 - ty) * vy0,
            ty * vy1,
        ],
        axis=2,
    )
    payload = jnp.pad(payload, ((0, 0), (0, 0), (0, 2), (0, 0)))
    payload = payload.reshape(b, K * K * 8, n_pad)

    def _jrow_from(ys):  # ys [b, taps, n_pad] -> [b, nt]
        ylo = ys.min(axis=1).reshape(b, nt, ct)
        yhi = ys.max(axis=1).reshape(b, nt, ct)
        return _tile_windows(
            jnp.concatenate([ylo, yhi], axis=-1).reshape(b, nt * 2 * ct),
            nt, 2 * ct, stride, wrows, nw,
        )

    if n_cls == K:
        jrow = jnp.stack(
            [_jrow_from(y0i[:, cls * K : (cls + 1) * K]) for cls in range(K)]
        )  # [K, b, nt]
    else:
        jrow = _jrow_from(y0i)[None]  # [1, b, nt]

    wk = weight.astype(compute_dtype).T  # [cout, 9*c], VMEM-resident
    if algo == "wbig":
        wins = prepare_dcn_windows_flat(
            x, stride=stride, wrows=wrows, cc=cc,
            compute_dtype=compute_dtype,
        )
        wwp = wins.shape[-1] // wrows
        val_specs = [
            pl.BlockSpec(
                (1, 1, ncc, cc, wrows * wwp),
                lambda i, t, jr: (i, jr[0, i, t], 0, 0, 0),
            )
        ]
        kern = functools.partial(
            _kernel_conv, wrows, ncc, cc, stride, compute_dtype
        )
        scratch = [
            pltpu.VMEM((K * K * c, ct), compute_dtype),
            pltpu.VMEM((wrows * wwp, ct), compute_dtype),
        ]
    else:
        assert algo == "rc", algo
        wins = prepare_dcn_windows(
            x, stride=stride, wrows=wrows, cc=cc,
            compute_dtype=compute_dtype,
        )
        wwp = wins.shape[-1]
        val_specs = [
            pl.BlockSpec(
                (1, 1, ncc, wrows * cc, wwp),
                lambda i, t, jr, c_=cls: (i, jr[c_, i, t], 0, 0, 0),
            )
            for cls in range(n_cls)
        ]
        kern = functools.partial(
            _kernel_conv_rc, wrows, ncc, cc, stride, compute_dtype, n_cls
        )
        scratch = [pltpu.VMEM((K * K * c, ct), compute_dtype)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, K * K * 8, ct), lambda i, t, jr: (i, 0, t)),
        ]
        + val_specs
        + [
            pl.BlockSpec((cout, K * K * c), lambda i, t, jr: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, cout, ct), lambda i, t, jr: (i, 0, t)),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, cout, n_pad), compute_dtype),
        interpret=interpret,
    )(jrow, payload, *([wins] * len(val_specs)), wk)
    return out[:, :, :n]


def _sample_ref(x, off_y, off_x, mask, *, conv_stride, clip_y):
    """Reference jnp formulation of the SAME clipped sampling (backward
    pass and correctness oracle). Returns [B, 9*C, OH*OW] like _forward."""
    from bevformer_tpu.models.resnet import _bilinear_gather

    b, h, w, c = x.shape
    _, oh, ow, kk = off_y.shape
    ys = jnp.arange(oh, dtype=jnp.float32) * conv_stride - 1.0
    xs = jnp.arange(ow, dtype=jnp.float32) * conv_stride - 1.0
    ky, kx = jnp.meshgrid(
        jnp.arange(K, dtype=jnp.float32),
        jnp.arange(K, dtype=jnp.float32),
        indexing="ij",
    )
    oyc = jnp.clip(off_y.astype(jnp.float32), -clip_y, clip_y)
    py = ys[None, :, None, None] + ky.reshape(-1)[None, None, None, :] + oyc
    px = (
        xs[None, None, :, None]
        + kx.reshape(-1)[None, None, None, :]
        + off_x.astype(jnp.float32)
    )
    py = jnp.broadcast_to(py, (b, oh, ow, kk))
    px = jnp.broadcast_to(px, (b, oh, ow, kk))
    sampled = _bilinear_gather(x.astype(jnp.float32), py, px)
    sampled = sampled * mask.astype(jnp.float32)[..., None]
    # [b, oh, ow, 9, c] -> [b, 9*c, oh*ow]
    return sampled.reshape(b, oh * ow, kk * c).transpose(0, 2, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _pallas_vjp(x, off_y, off_x, mask, conv_stride, clip_y, cap_tile,
                stride, cc, compute_dtype, interpret):
    return _forward(
        x, off_y, off_x, mask,
        conv_stride=conv_stride, clip_y=clip_y, cap_tile=cap_tile,
        stride=stride, cc=cc, compute_dtype=compute_dtype,
        interpret=interpret,
    )


def _fwd(x, off_y, off_x, mask, conv_stride, clip_y, cap_tile, stride, cc,
         compute_dtype, interpret):
    out = _forward(
        x, off_y, off_x, mask,
        conv_stride=conv_stride, clip_y=clip_y, cap_tile=cap_tile,
        stride=stride, cc=cc, compute_dtype=compute_dtype,
        interpret=interpret,
    )
    return out, (x, off_y, off_x, mask)


def _bwd(conv_stride, clip_y, cap_tile, stride, cc, compute_dtype,
         interpret, res, g):
    """Scatter-free backward: the DCN sampling IS single-level msda
    (items = (pixel, tap) raster-ordered, heads = C/32, p=1), so the
    windowed Pallas backward in msda_pallas serves it — XLA's gather-vjp
    scatter costs ~1.7 us/row (seconds per DCN block at base scale)."""
    from bevformer_tpu.kernels import msda_pallas as mp

    x, off_y, off_x, mask = res
    b, hh, ww, c = x.shape
    _, oh, ow, _ = off_y.shape
    n = oh * ow
    dsub = 32 if c % 32 == 0 else c
    heads = c // dsub
    n9 = n * K * K

    # sampling coordinates exactly as the forward (incl. the y clip)
    ys = jnp.arange(oh, dtype=jnp.float32) * conv_stride - 1.0
    xs = jnp.arange(ow, dtype=jnp.float32) * conv_stride - 1.0
    ky, kx = jnp.meshgrid(
        jnp.arange(K, dtype=jnp.float32),
        jnp.arange(K, dtype=jnp.float32),
        indexing="ij",
    )
    oyf = off_y.astype(jnp.float32)
    oyc = jnp.clip(oyf, -clip_y, clip_y)
    py = ys[None, :, None, None] + ky.reshape(-1)[None, None, None, :] + oyc
    px = (
        xs[None, None, :, None]
        + kx.reshape(-1)[None, None, None, :]
        + off_x.astype(jnp.float32)
    )
    # FLAT layouts at the _backward boundary (6D broadcasts with unit/2
    # minor dims get tile-padded layouts there)
    loc2 = jnp.stack(
        [(px + 0.5) / ww, (py + 0.5) / hh], axis=-1
    ).reshape(b, n9, 2)
    loc_b = jnp.tile(loc2, (1, 1, heads))  # cols (head, (x, y))
    attw = jnp.tile(
        mask.astype(jnp.float32).reshape(b, n9, 1), (1, 1, heads)
    )
    value = x.astype(jnp.float32).reshape(b, hh * ww, c)

    # cotangent: g [b, 9C, n] rows (tap, channel) -> msda item order
    # (pixel-major, tap-minor) x channels
    g_items = (
        g.astype(jnp.float32)
        .reshape(b, K * K, c, n)
        .transpose(0, 3, 1, 2)
        .reshape(b, n9, c)
    )

    bstride = 4
    wrows = _wrows_for(-(-cap_tile // (K * K)), ow, conv_stride, clip_y,
                       bstride)
    dval, dloc, dattw = mp._backward(
        value, ((hh, ww),), loc_b, attw, g_items,
        heads=heads, points=1,
        stride=bstride, halo=wrows - bstride - 1, cap_tile=cap_tile,
        compute_dtype=compute_dtype, interpret=interpret,
    )
    dx = dval.reshape(b, hh, ww, c).astype(x.dtype)
    dmask = (
        dattw.reshape(b, n9, heads).sum(axis=-1)
        .reshape(b, oh, ow, K * K).astype(mask.dtype)
    )
    dl = dloc.reshape(b, n9, heads, 2).sum(axis=2).reshape(
        b, oh, ow, K * K, 2
    )
    doff_x = (dl[..., 0] / ww).astype(off_x.dtype)
    # clip passes gradient only inside the clamp range
    doff_y = (
        (dl[..., 1] / hh) * ((oyf > -clip_y) & (oyf < clip_y))
    ).astype(off_y.dtype)
    return dx, doff_y, doff_x, dmask


_pallas_vjp.defvjp(_fwd, _bwd)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12)
)
def _pallas_conv_vjp(x, off_y, off_x, mask, weight, conv_stride, clip_y,
                     cap_tile, stride, cc, compute_dtype, interpret, algo):
    return _forward_conv(
        x, off_y, off_x, mask, weight,
        conv_stride=conv_stride, clip_y=clip_y, cap_tile=cap_tile,
        stride=stride, cc=cc, compute_dtype=compute_dtype,
        interpret=interpret, algo=algo,
    )


def _conv_fwd(x, off_y, off_x, mask, weight, conv_stride, clip_y, cap_tile,
              stride, cc, compute_dtype, interpret, algo):
    out = _forward_conv(
        x, off_y, off_x, mask, weight,
        conv_stride=conv_stride, clip_y=clip_y, cap_tile=cap_tile,
        stride=stride, cc=cc, compute_dtype=compute_dtype,
        interpret=interpret, algo=algo,
    )
    return out, (x, off_y, off_x, mask, weight)


def _conv_bwd(conv_stride, clip_y, cap_tile, stride, cc, compute_dtype,
              interpret, algo, res, g):
    """Unfold the conv contraction, then reuse the scatter-free sampling
    backward. dW needs the im2col activations, which the folded forward
    never materializes — ONE extra kernel pass recomputes them (cheaper
    than checkpointing 9*C*n through the whole train step)."""
    x, off_y, off_x, mask, weight = res
    gf = g.astype(jnp.float32)  # [b, cout, n]
    sampled = _forward(
        x, off_y, off_x, mask,
        conv_stride=conv_stride, clip_y=clip_y, cap_tile=cap_tile,
        stride=stride, cc=cc, compute_dtype=compute_dtype,
        interpret=interpret,
    ).astype(jnp.float32)  # [b, 9c, n]
    dweight = jnp.einsum("bin,bon->io", sampled, gf).astype(weight.dtype)
    dsampled = jnp.einsum(
        "io,bon->bin", weight.astype(jnp.float32), gf
    )
    dx, doff_y, doff_x, dmask = _bwd(
        conv_stride, clip_y, cap_tile, stride, cc, compute_dtype,
        interpret, (x, off_y, off_x, mask), dsampled,
    )
    return dx, doff_y, doff_x, dmask, dweight


_pallas_conv_vjp.defvjp(_conv_fwd, _conv_bwd)


def dcn_conv_pallas(
    x, off_y, off_x, mask, weight, *,
    conv_stride=1, clip_y=6.0, cap_tile=None, stride=None, cc=None,
    compute_dtype=jnp.bfloat16,
):
    """Fused DCNv2 deformable 3x3 conv: sampling + modulation + the conv
    weight contraction in one Pallas kernel. weight [9*C, Cout] (im2col
    row order). Returns [B, Cout, OH*OW]. Same clipped-y semantics as
    `dcn_sample_pallas`; fully differentiable (incl. dweight)."""
    try:
        interpret = jax.devices()[0].platform != "tpu"
    except Exception:  # pragma: no cover
        interpret = True
    algo = os.environ.get("DCN_ALGO", "rc")
    if cc is None:
        # wbig: cc=128 fills the MXU M dim of the flat-window matmul
        cc = (128 if algo == "wbig" and x.shape[-1] % 128 == 0 else 64)
    return _pallas_conv_vjp(
        x, off_y, off_x, mask, weight, conv_stride, clip_y,
        cap_tile or _CAP_TILE, stride or _STRIDE, cc,
        compute_dtype, interpret, algo,
    )


def resolve_impl(mode: str) -> str:
    """Resolve a config `fused_dcn` mode: 'auto' -> 'bf16' on a real TPU,
    'off' elsewhere (CPU tests/goldens keep the exact gather path)."""
    if mode == "auto":
        try:
            platform = jax.devices()[0].platform
        except Exception:  # pragma: no cover
            return "off"
        return "bf16" if platform == "tpu" else "off"
    assert mode in ("off", "fp32", "bf16"), mode
    return mode


# tuning hooks (bench sweeps); shipped defaults are the measured optimum
# (tools/bench_dcn_probe.py, clip3: s4/ct256 3.00 ms/layer vs s8/ct512
# 3.75 — smaller tiles cut the worst-case row span, stride 4 the window
# quantisation, so wrows drops 25 -> 18)
_CAP_TILE = int(os.environ.get("DCN_CAP_TILE", "256"))
_STRIDE = int(os.environ.get("DCN_STRIDE", "4"))


def dcn_sample_pallas(
    x, off_y, off_x, mask, *,
    conv_stride=1, clip_y=6.0, cap_tile=None, stride=None, cc=64,
    compute_dtype=jnp.bfloat16,
):
    """Fused DCNv2 deformable im2col: [B, 9*C, OH*OW], rows (tap, channel).

    Exact vs the gather path whenever |off_y| <= clip_y (off_x unrestricted).
    Differentiable (backward = XLA gather path on the clipped formulation).
    Off-TPU runs the kernel in interpreter mode (tests)."""
    try:
        interpret = jax.devices()[0].platform != "tpu"
    except Exception:  # pragma: no cover
        interpret = True
    return _pallas_vjp(
        x, off_y, off_x, mask, conv_stride, clip_y,
        cap_tile or _CAP_TILE, stride or _STRIDE, cc,
        compute_dtype, interpret,
    )
