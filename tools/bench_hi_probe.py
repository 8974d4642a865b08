"""Heads-inner (v3) kernel decomposition probe at base SCA scale.

Splits ms_deform_attn_hi's cost into: window prep (XLA), payload prep
(XLA), the pallas kernel itself (windows precomputed), and in-kernel
variants (matmul-only / noop DMA floor) — the v3 analogue of
tools/bench_kernel_probe3.py (which probes the retired v2 layout).

Env:  Q (queries/cam; cap0.4=16000, cap0.25=10112)  STRIDE  HALO  CT
      TSA=1 for TemporalSelfAttention shapes (1 level, 200x200, p=4)
Usage: [Q=10112 HALO=9] python tools/bench_hi_probe.py [modes...]
Modes: full kern wprep payprep matonly noop  (default: all)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bevformer_tpu.kernels import msda_hi as mh
from bevformer_tpu.kernels.msda_pallas import _n_windows, _round_up

if os.environ.get("TSA"):
    b, q, nz, h, l, ppa, d = 2, 40000, 1, 8, 1, 4, 32
    SHAPES = ((200, 200),)
else:
    b, nz, h, l, ppa, d = 6, 4, 8, 4, 2, 32
    q = int(os.environ.get("Q", "16000"))
    SHAPES = ((116, 200), (58, 100), (29, 50), (15, 25))

STRIDE = int(os.environ.get("STRIDE", "4"))
HALO = int(os.environ.get("HALO", "9"))
CT = int(os.environ.get("CT", "512"))
HALO = mh.effective_halo(STRIDE, HALO) if hasattr(mh, "effective_halo") \
    else HALO
WROWS = STRIDE + HALO + 1
k = sum(a * c for a, c in SHAPES)
qn = q * nz
p = ppa

rng = np.random.RandomState(0)
value = jnp.array(rng.randn(b, k, h * d) * 0.1, jnp.float32)

# flat (l, h, p[, 2]) channel layout, rows sorted by anchor y, offsets
# near-constant per head (one-directional, like grid init) within HALO
base_y = (np.arange(qn) + 0.5) / qn
loc = np.empty((b, qn, l * h * p * 2), np.float32)
attw = rng.rand(b, qn, l * h * p).astype(np.float32)
for lvl in range(l):
    hh_l = SHAPES[lvl][0]
    for hd_i in range(h):
        # per-head mean row offset in [-halo/2, halo/2] rows + jitter
        mean = (hd_i / max(h - 1, 1) - 0.5) * (HALO - 2)
        for p_i in range(p):
            ci = (lvl * h + hd_i) * p + p_i
            jit = (rng.rand(b, qn) - 0.5) * 2.0
            loc[:, :, ci * 2 + 0] = rng.rand(b, qn)
            loc[:, :, ci * 2 + 1] = (
                base_y[None, :] + (mean + jit) / hh_l
            )
loc = jnp.array(loc)
attw = jnp.array(attw)


def make_kernel_var(mode):
    """v3 kernel with ablation modes."""
    def kern(jrow_ref, pay_ref, *refs):
        i = pl.program_id(0)
        t = pl.program_id(1)
        val_refs = refs[:l * h]
        out_ref = refs[l * h]
        ntq = -(-qn // CT)
        for hd_i in range(h):
            acc = jnp.zeros((d, CT), jnp.float32)
            for lvl in range(l):
                c0 = (lvl * h + hd_i) * mh.NCH
                pay = pay_ref[0, 0, c0: c0 + mh.NCH, :].astype(jnp.float32)
                x0 = pay[0:1]; wx0 = pay[1:2]; wx1 = pay[2:3]
                y0 = pay[3:4]; wy0 = pay[4:5]; wy1 = pay[5:6]
                val = val_refs[lvl * h + hd_i][0, 0, 0]
                wwp = val.shape[-1]
                if mode == "noop":
                    acc = acc + (pay[0:1] * 0.0) + jnp.broadcast_to(
                        val[0:1, :1], (1, CT)) * 0.0
                    continue
                cio = jax.lax.broadcasted_iota(jnp.int32, (wwp, CT), 0)
                xi = x0.astype(jnp.int32)
                wcol = (jnp.where(cio == xi, wx0, 0.0)
                        + jnp.where(cio == xi + 1, wx1, 0.0))
                tmat = jnp.dot(
                    val, wcol.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
                if mode == "matonly":
                    acc = acc + tmat[:d]
                    continue
                base = (jrow_ref[lvl * h + hd_i, i, t - (t // ntq) * ntq]
                        * STRIDE).astype(jnp.float32)
                for r in range(WROWS):
                    fr = base + float(r)
                    wr = (jnp.where(y0 == fr, wy0, 0.0)
                          + jnp.where(y0 == fr - 1.0, wy1, 0.0))
                    acc = acc + wr * tmat[r * d: (r + 1) * d]
            out_ref[0, 0, hd_i * d: (hd_i + 1) * d, :] = acc.astype(
                out_ref.dtype)
    return kern


def prep_cm(value_cm, shapes, stride, halo, cd):
    """Window prep from CHANNEL-MAJOR value [b, h, d, k]: per level the
    build is slice + pad + NON-minor (d <-> row-group) transpose + grouped
    stack — the minor dim (ww) never moves, unlike the [b,k,h*d] path's
    d<->ww relayout."""
    bb, hh_, dd, kk = value_cm.shape
    starts = np.cumsum([0] + [a * c for a, c in shapes])
    wrows = stride + halo + 1
    g = wrows // stride
    out = []
    for lvl, (hh, ww) in enumerate(shapes):
        nw = mh._n_windows(hh, stride)
        wwp = _round_up(ww, 128)
        img = jax.lax.dynamic_slice_in_dim(
            value_cm, int(starts[lvl]), hh * ww, 3
        ).reshape(bb, hh_, dd, hh, ww).astype(cd)
        hpad = (nw + g - 1) * stride
        img = jnp.pad(
            img, ((0, 0), (0, 0), (0, 0), (0, hpad - hh), (0, wwp - ww)))
        tg = img.reshape(bb, hh_, dd, hpad // stride, stride, wwp)
        tg = tg.transpose(0, 3, 1, 4, 2, 5)  # [b, ng, h, stride, d, wwp]
        tg = tg.reshape(bb, hpad // stride, hh_, stride * dd, wwp)
        wins = jnp.stack([tg[:, o: o + nw] for o in range(g)], axis=3)
        wins = wins.reshape(bb, nw, hh_, g, stride * dd, wwp)
        out.append(wins.reshape(bb, nw, hh_, wrows * dd, wwp))
    return out


@functools.partial(jax.jit, static_argnames=("mode",))
def run(val_in, loc_in, attw_in, mode):
    cd = jnp.bfloat16
    if mode in ("xpose", "prepcm", "fullcm"):
        # channel-major variants: value -> [b, h, d, k]
        vcm = val_in.reshape(b, k, h, d).transpose(0, 2, 3, 1)
        if mode == "xpose":
            return jnp.full((1,), vcm.astype(jnp.float32).sum() * 1e-20,
                            jnp.float32)
        wvcm = prep_cm(vcm, SHAPES, STRIDE, HALO, cd)
        if mode == "prepcm":
            s = sum(v.astype(jnp.float32).sum() for v in wvcm)
            return jnp.full((1,), s * 1e-20, jnp.float32)
        out = mh._forward_hi(
            val_in, SHAPES, loc_in, attw_in, wvcm,
            heads=h, points=p, stride=STRIDE, halo=HALO, cap_tile=CT,
            compute_dtype=cd)
        return out.astype(jnp.float32).ravel()[:1]
    wv = mh.prepare_window_values_hi(
        val_in, SHAPES, heads=h, stride=STRIDE, halo=HALO, compute_dtype=cd)
    if mode == "wprep":
        s = sum(v.astype(jnp.float32).sum() for v in wv)
        return jnp.full((1,), s * 1e-20, jnp.float32)
    pay, jrow, q_pad, nt, ntq = mh._prep_hi(
        loc_in, attw_in, SHAPES, h, p, CT, STRIDE, WROWS, cd)
    if mode == "payprep":
        s = pay.astype(jnp.float32).sum() + jrow.sum().astype(jnp.float32)
        return jnp.full((1,), s * 1e-20, jnp.float32)
    if mode in ("full", "kern"):
        out = mh._forward_hi(
            val_in, SHAPES, loc_in, attw_in,
            None if mode == "full" else wv,
            heads=h, points=p, stride=STRIDE, halo=HALO, cap_tile=CT,
            compute_dtype=cd)
        return out.astype(jnp.float32).ravel()[:1]
    rm = WROWS * d
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nt),
        in_specs=[pl.BlockSpec((1, 1, l * h * mh.NCH, CT),
                               lambda i, t, jr: (i, t, 0, 0))]
        + [
            (lambda li_, wwp_: pl.BlockSpec(
                (1, 1, 1, rm, wwp_),
                lambda i, t, jr, li=li_: (
                    i, jr[li, i, t - (t // ntq) * ntq], li % h, 0, 0),
            ))(lvl_ * h + hd_, _round_up(ww, 128))
            for lvl_, (hh, ww) in enumerate(SHAPES)
            for hd_ in range(h)
        ],
        out_specs=pl.BlockSpec((1, 1, h * d, CT),
                               lambda i, t, jr: (i, t, 0, 0)),
    )
    out = pl.pallas_call(
        make_kernel_var(mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nt, h * d, CT), cd),
    )(jrow, pay, *[wv[lvl] for lvl in range(l) for _ in range(h)])
    return out.astype(jnp.float32).ravel()[:1]


def timed(mode, reps=4):
    def chained(v, ls, ws):
        def body(c, _):
            o = run(v + c * 1e-9, ls, ws, mode)
            return c + o[0] * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return c
    j = jax.jit(chained)
    float(j(value, loc, attw))  # compile + warm (host fetch: the relay's
    t0 = time.perf_counter()    # block_until_ready returns early)
    float(j(value, loc, attw))
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{mode:10s} Q={q} S={STRIDE} H={HALO} CT={CT}: {dt:8.2f} ms",
          flush=True)
    return dt


if __name__ == "__main__":
    modes = sys.argv[1:] or ["full", "kern", "matonly", "noop", "wprep",
                             "payprep"]
    for m in modes:
        timed(m)
