"""Decompose fused-msda time: routing vs pallas kernel vs scatter-back.

Level-0-only (116,200) at base SCA scale.
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bevformer_tpu.kernels import msda_pallas as mp

B, H, D, P = 6, 8, 32, 8
HH, WW = 116, 200
Q = 16000
bh, n = B * H, Q * P
hb = 2
nb = -(-HH // hb)
cap = mp._capacity(n, nb, 2.0, 256)
nt = cap // 256
rng = np.random.RandomState(0)

loc = jnp.array(rng.rand(bh, n, 2), jnp.float32)
attw = jnp.array(rng.rand(bh, n), jnp.float32)
val = jnp.array(rng.randn(B, HH * WW, H, D), jnp.float32)


def timed(fn, args, label, reps=3):
    def chained(*a):
        def body(c, _):
            out = fn(*((a[0] + c * 1e-9,) + a[1:]))
            return c + out.ravel()[0].astype(jnp.float32) * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return c
    j = jax.jit(chained)
    r = float(j(*args))
    t0 = time.perf_counter()
    r = float(j(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {dt*1e3:.1f} ms", flush=True)
    return dt


# 1. routing + payload build + slot scatter
def route_only(loc, attw):
    pay, qid, _ = mp._route_level(loc, attw, HH, WW, hb, nb, cap)
    return pay.ravel()[:1] + qid[0, :1]

timed(route_only, (loc, attw), "route+payload+scatter")


# 1b. payload build only (no scatter, no cumsum)
def payload_only(loc, attw):
    x = loc[..., 0] * WW - 0.5
    y = loc[..., 1] * HH - 0.5
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    tx = x - x0; ty = y - y0
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    band = jnp.clip(jnp.floor_divide(y0i, hb), 0, nb - 1)
    pay = jnp.stack([x0, tx, ty, band.astype(jnp.float32)], -1) * attw[..., None]
    return pay.ravel()[:1]

timed(payload_only, (loc, attw), "payload math only")


# 1c. cumsum rank only
def rank_only(loc, attw):
    y = loc[..., 1] * HH - 0.5
    y0i = jnp.floor(y).astype(jnp.int32)
    band = jnp.clip(jnp.floor_divide(y0i, hb), 0, nb - 1)
    onehot = jax.nn.one_hot(band, nb, dtype=jnp.int32)
    rank = jnp.cumsum(onehot, axis=1) - onehot
    rank = jnp.take_along_axis(rank, band[..., None], axis=2)[..., 0]
    return (rank + attw[:, :1].astype(jnp.int32)).ravel()[:1]

timed(rank_only, (loc, attw), "cumsum rank only")


# 1d. scatter only (precomputed slot)
pay8 = jnp.array(rng.rand(bh, n, 8), jnp.float32)
slot = jnp.array(rng.permutation(nb * cap)[:n][None].repeat(bh, 0), jnp.int32)

def scatter_only(pay8, slot):
    bi = jnp.arange(bh)[:, None]
    buf = jnp.zeros((bh, nb * cap, 8), jnp.float32)
    buf = buf.at[bi, slot].set(pay8, mode="drop", unique_indices=True)
    return buf.ravel()[:1]

timed(scatter_only, (pay8, slot), "slot scatter only")


# 2. pallas kernel only
pay_k = jnp.array(rng.rand(bh, nb, 8, cap), jnp.float32)
vb = mp.prepare_band_values(val, ((HH, WW),), (hb,))[0]
rm, wwp = vb.shape[-2:]

def kernel_only(pay_k, vb):
    out = pl.pallas_call(
        functools.partial(mp._kernel, hb, D, jnp.bfloat16),
        grid=(bh, nb, nt),
        in_specs=[
            pl.BlockSpec((1, 1, 8, 256), lambda i, j, t: (i, j, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rm, wwp), lambda i, j, t: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, D, 256), lambda i, j, t: (i, 0, j * nt + t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, D, nb * cap), jnp.float32),
    )(pay_k, vb)
    return out.ravel()[:1]

timed(kernel_only, (pay_k, vb), "pallas kernel only")


# 3. scatter-add back
slot_out = jnp.array(rng.rand(bh, D, nb * cap), jnp.float32)
qq = jnp.array(rng.randint(0, Q, (bh, nb * cap)), jnp.int32)

def scatter_back(slot_out, qq):
    out = jax.vmap(lambda o, i, u: o.at[:, i].add(u))(
        jnp.zeros((bh, D, Q), jnp.float32), qq, slot_out
    )
    return out.ravel()[:1]

timed(scatter_back, (slot_out, qq), "scatter-add back")
