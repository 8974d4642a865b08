"""Sweep the heads-inner kernel (msda_hi._forward_hi) at PRODUCTION SCA
shapes (cap 0.25: 10000 queries x 4 z-anchors per camera) over
halo x cap_tile, plus the TSA shape. Usage:
  python tools/bench_hi_sweep.py [sca|tsa] [halo:ct ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from bevformer_tpu.kernels import msda_hi as mh

which = sys.argv[1] if len(sys.argv) > 1 else "sca"
# each combo is halo:ct or stride:halo:ct
combos = [c for c in sys.argv[2:]] or ["9:512", "7:512", "9:1024", "7:1024"]

rng = np.random.RandomState(0)

if which == "sca":
    b, e, h = 6, 256, 8
    shapes = ((116, 200), (58, 100), (29, 50), (15, 25))
    n_items = 40000  # cap 10000 x nz 4
    ppa = 2
    nch = 4 * h * ppa
elif which == "tsa":
    b, e, h = 2, 256, 8
    shapes = ((200, 200),)
    n_items = 40000  # bev queries, grid-ordered
    ppa = 4
    nch = 1 * h * ppa

k = sum(a * c for a, c in shapes)
v_cm = jnp.array(rng.randn(b, e, k) * 0.1, jnp.float32)
# row-coherent sorted locations: y walks the image top to bottom
base_y = (np.arange(n_items) + 0.5) / n_items
loc = rng.rand(b, n_items, nch, 2).astype(np.float32)
loc[..., 1] = base_y[None, :, None] + (loc[..., 1] - 0.5) * (6.0 / 116)
loc = jnp.array(np.clip(loc, 0, 1).reshape(b, n_items, nch * 2))
w = jnp.array(rng.rand(b, n_items, nch).astype(np.float32))


def timed(fn, args, label, reps=6):
    def chained(*a):
        def body(c, _):
            out = fn(*((a[0] + c * 1e-9,) + a[1:]))
            return c + out.ravel()[0].astype(jnp.float32) * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return c
    j = jax.jit(chained)
    t0 = time.perf_counter(); float(j(*args)); tc = time.perf_counter() - t0
    t0 = time.perf_counter(); float(j(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {dt*1e3:.2f} ms (compile {tc:.0f}s)", flush=True)


for combo in combos:
    parts = [int(x) for x in combo.split(":")]
    stride, halo, ct = parts if len(parts) == 3 else (4, *parts)
    timed(
        lambda vv, ll, ww, stride=stride, halo=halo, ct=ct:
        mh.ms_deform_attn_hi(
            None, shapes, ll, ww, heads=h, points=ppa, stride=stride,
            halo=halo, cap_tile=ct, compute_dtype=jnp.bfloat16,
            value_cm=vv,
        ),
        (v_cm, loc, w),
        f"{which} hi-kernel s{stride} h{halo} ct{ct} (wrows "
        f"{stride + mh.effective_halo(stride, halo) + 1})",
    )
