"""Fused Pallas TPU kernel for multi-scale deformable attention.

Why: XLA's gather on TPU costs ~8-30 ns *per gathered slice*; the deformable
attention of a bevformer_tiny forward spends ~100 ms of 111 ms there. The
TPU vector core has a per-lane `dynamic_gather` instruction (exposed to
Pallas via `jnp.take_along_axis(x, idx, axis=0)` with idx.shape == x.shape)
that permutes an entire [K, 128] register-resident block per issue.

Kernel layout (one call per feature level):
  * 4 heads are packed into the 128-lane axis (4 x Dh=32), so ONE gather
    row serves 4 heads with *different* indices (per-lane independence).
  * the (query, point, corner) work-list is flattened row-wise; each grid
    step gathers up to K rows from the VMEM-resident value block, applies
    the fused (bilinear x attention) weight, and reduces the 4*P rows of
    each query on-chip.
  * out-of-bounds corners arrive with weight 0 and a clamped (safe) index,
    reproducing grid_sample zeros padding exactly.

Forward-only fusion; the backward pass uses the XLA patch-gather path via
jax.custom_vjp (training steps are compile-once, and the backward gathers
are scatter-adds XLA handles adequately).

Validated against `msda.ms_deform_attn_jnp` in tests/test_msda_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
HEAD_PACK = 4  # heads packed into the lane axis (Dh=32 each)


def supported(value, spatial_shapes, sampling_locations) -> bool:
    # DISABLED: Mosaic's tpu.dynamic_gather only shuffles within a single
    # (8, 128) vreg along the gather dimension ("Multiple source vregs along
    # gather dimension" compile error for K > 8). Arbitrary-K gathers are
    # instead served by the MXU multi-hot path (`msda.ms_deform_attn_onehot`)
    # for small K and the 2x2-patch XLA gather otherwise. This kernel is
    # kept for the in-vreg case and as the basis for a future tiled kernel.
    return False


def _plan(q: int, p4: int, k: int):
    """queries-per-chunk and chunk count for the row-folded work list."""
    qc = max(k // p4, 1)
    qc = min(qc, q)
    n_chunks = -(-q // qc)
    rows = qc * p4  # rows used per chunk (<= k)
    return qc, n_chunks, rows


def _gather_kernel(p4, idx_ref, w_ref, value_ref, out_ref):
    """Grid (G, C): value [K, 128] resident; idx/w [K, 128] per chunk.

    Rows are query-major with p4 = 4*num_points items per query; the whole
    chunk is gathered in one per-lane dynamic_gather, weighted, and folded.
    """
    v = value_ref[0]  # [K, 128]
    idx = idx_ref[0, 0]  # [K, 128]
    w = w_ref[0, 0]
    gathered = jnp.take_along_axis(v, idx, axis=0)
    weighted = gathered * w
    qc = out_ref.shape[2]
    w3 = weighted[: qc * p4].reshape(qc, p4, LANES)
    out_ref[0, 0] = w3.sum(axis=1)


def _level_attn(
    value_l: jnp.ndarray,  # [B, Kl, H, 32] fp32
    hh: int,
    ww: int,
    loc_l: jnp.ndarray,  # [B, Q, H, P, 2]
    attw_l: jnp.ndarray,  # [B, Q, H, P]
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    b, k, h, d = value_l.shape
    _, q, _, p, _ = loc_l.shape
    g = (b * h) // HEAD_PACK
    p4 = 4 * p

    # ---- work list: corner indices + fused weights, [B, H, Q*P*4] ----
    x = loc_l[..., 0] * ww - 0.5  # [B, Q, H, P]
    y = loc_l[..., 1] * hh - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    idx_c, w_c = [], []
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
        idx_c.append(idx)
        w_c.append(wt * attw_l * valid.astype(jnp.float32))
    # [B, Q, H, P, 4] -> [B, H, Q, P*4]
    idx_all = jnp.stack(idx_c, -1).transpose(0, 2, 1, 3, 4).reshape(b, h, q, p4)
    w_all = jnp.stack(w_c, -1).transpose(0, 2, 1, 3, 4).reshape(b, h, q, p4)

    qc, n_chunks, rows = _plan(q, p4, k)
    q_pad = qc * n_chunks
    pad_q = q_pad - q
    if pad_q:
        idx_all = jnp.pad(idx_all, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        w_all = jnp.pad(w_all, ((0, 0), (0, 0), (0, pad_q), (0, 0)))

    # chunk rows: [B, H, C, qc*p4] -> pad rows to K
    idx_all = idx_all.reshape(b, h, n_chunks, qc * p4)
    w_all = w_all.reshape(b, h, n_chunks, qc * p4)
    pad_r = k - qc * p4
    if pad_r:
        idx_all = jnp.pad(idx_all, ((0, 0), (0, 0), (0, 0), (0, pad_r)))
        w_all = jnp.pad(w_all, ((0, 0), (0, 0), (0, 0), (0, pad_r)))

    # pack heads into lanes: [B, H, C, K] -> [G, C, K, 128]
    def pack(a, dtype):
        a = a.reshape(b, g // b if b else g, HEAD_PACK, n_chunks, k)
        a = a.transpose(0, 1, 3, 4, 2)  # [B, G/B, C, K, 4]
        a = jnp.broadcast_to(a[..., None], a.shape + (d,))
        return a.reshape(b * (h // HEAD_PACK), n_chunks, k, HEAD_PACK * d).astype(dtype)

    idx_packed = pack(idx_all, jnp.int32)
    w_packed = pack(w_all, jnp.float32)

    # value: [B, K, H, 32] -> [G, K, 128]
    val = value_l.transpose(0, 2, 1, 3).reshape(b, h // HEAD_PACK, HEAD_PACK, k, d)
    val = val.transpose(0, 1, 3, 2, 4).reshape(g, k, HEAD_PACK * d)
    val = val.astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_gather_kernel, p4),
        grid=(g, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, k, LANES), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k, LANES), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, qc, LANES), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, n_chunks, qc, LANES), jnp.float32),
        interpret=interpret,
    )(idx_packed, w_packed, val)

    # [G, C, qc, 128] -> [B, Q, H, 32]
    out = out.reshape(b, h // HEAD_PACK, q_pad, HEAD_PACK, d)[:, :, :q]
    out = out.transpose(0, 2, 1, 3, 4).reshape(b, q, h, d)
    return out


def _forward(value, spatial_shapes, sampling_locations, attention_weights,
             *, interpret=False):
    b, k, h, d = value.shape
    _, q, _, l, p, _ = sampling_locations.shape
    loc = sampling_locations.astype(jnp.float32)
    attw = attention_weights.astype(jnp.float32)
    out = jnp.zeros((b, q, h, d), jnp.float32)
    start = 0
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        val_l = jax.lax.dynamic_slice_in_dim(value, start, hh * ww, 1)
        out = out + _level_attn(
            val_l.astype(jnp.float32),
            hh,
            ww,
            loc[:, :, :, lvl],
            attw[:, :, :, lvl],
            interpret=interpret,
        )
        start += hh * ww
    return out.reshape(b, q, h * d).astype(value.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas(value, spatial_shapes, sampling_locations, attention_weights):
    return _forward(value, spatial_shapes, sampling_locations, attention_weights)


def _fwd(value, spatial_shapes, sampling_locations, attention_weights):
    out = _forward(value, spatial_shapes, sampling_locations, attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _bwd(spatial_shapes, res, g):
    from bevformer_tpu.kernels.msda import ms_deform_attn_patch

    value, loc, attw = res
    _, vjp = jax.vjp(
        lambda v, l_, w_: ms_deform_attn_patch(v, spatial_shapes, l_, w_),
        value,
        loc,
        attw,
    )
    return vjp(g)


ms_deform_attn_pallas.defvjp(_fwd, _bwd)
