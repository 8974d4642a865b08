"""Microbench: banded MXU msda vs the patch-gather path on real TPU.

Round-2 tuning harness for `ms_deform_attn_banded` (BENCH_NOTES.md,
"per-point banding"). Single SCA-like level (116, 200), per-camera
query counts scaled down so the multi-hot rows tensor fits HBM.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp
import numpy as np

from bevformer_tpu.kernels.msda import ms_deform_attn_banded, _msda_patch_chunked

B, H, D, P = 6, 8, 32, 8
SHAPES = ((116, 200),)
Q = 2000
K = sum(a * b for a, b in SHAPES)
rng = np.random.RandomState(0)
val = jnp.array(rng.randn(B, K, H, D), jnp.float32)
loc = jnp.array(rng.rand(B, Q, H, 1, P, 2), jnp.float32)
w = jnp.array(rng.rand(B, Q, H, 1, P), jnp.float32)

def timed(fn, label):
    # data-dependent chain to defeat relay early-return + hoisting
    def chained(v, l, ww):
        def body(c, _):
            o = fn(v + c * 1e-9, l, ww)
            return c + o.ravel()[0] * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=5)
        return c
    j = jax.jit(chained)
    r = float(j(val, loc, w))  # compile+run
    t0 = time.perf_counter()
    r = float(j(val, loc, w))
    dt = (time.perf_counter() - t0) / 5
    print(f"{label}: {dt*1e3:.1f} ms/call (chain val {r:.3e})")

timed(lambda v, l, ww: _msda_patch_chunked(v, SHAPES, l, ww), "patch  Q=2000")
timed(lambda v, l, ww: ms_deform_attn_banded(v, SHAPES, l, ww, band_rows=4,
                                             capacity_ratio=2.0), "banded Q=2000 hb=4 r=2")
timed(lambda v, l, ww: ms_deform_attn_banded(v, SHAPES, l, ww, band_rows=8,
                                             capacity_ratio=2.0), "banded Q=2000 hb=8 r=2")
