"""Microbench: fused windowed Pallas msda vs XLA paths at base-SCA scale.

Shapes = bevformer_base SCA per-camera capacity routing: B=6 cams, H=8,
D=32, P=8, Q=16000 routed queries, 4 FPN levels. Items are y-coherent
(what the SCA anchor sort produces). Round-1 baseline: patch-gather
507 ms/layer.

Timing via data-dependent scan chain (relay early-return defeat).
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

from bevformer_tpu.kernels.msda import _msda_patch_chunked
from bevformer_tpu.kernels import msda_pallas as mp

B, H, D, P = 6, 8, 32, 8
SHAPES = ((116, 200), (58, 100), (29, 50), (15, 25))
Q = int(os.environ.get("Q", 16000))
REPS = int(os.environ.get("REPS", 3))
K = sum(a * b for a, b in SHAPES)
rng = np.random.RandomState(0)
val = jnp.array(rng.randn(B, K, H, D), jnp.float32)

# y-coherent order: y grows with query index + per-level jitter of +-3 rows
base = (np.arange(Q) + 0.5) / Q
y = np.empty((B, Q, H, len(SHAPES), P), np.float32)
for lvl, (hh, ww) in enumerate(SHAPES):
    jit = rng.uniform(-3, 3, size=(B, Q, H, P))
    y[:, :, :, lvl, :] = base[None, :, None, None] + jit / hh
x = rng.rand(B, Q, H, len(SHAPES), P).astype(np.float32)
loc = jnp.array(np.stack([x, y], -1))
w = jnp.array(rng.rand(B, Q, H, len(SHAPES), P), jnp.float32)

drops = mp.window_drop_mass(SHAPES, loc, w, stride=8, halo=8)
total_w = float(jnp.sum(w))
print(f"drop mass: {drops} / total {total_w:.0f}", flush=True)


def timed(fn, label):
    def chained(v, l, ww):
        def body(c, _):
            o = fn(v + c * 1e-9, l, ww)
            return c + o.ravel()[0].astype(jnp.float32) * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return c
    j = jax.jit(chained)
    t0 = time.perf_counter()
    r = float(j(val, loc, w))
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = float(j(val, loc, w))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label}: {dt*1e3:.1f} ms/call (compile {t_compile:.0f}s, chain {r:.3e})", flush=True)
    return dt


if __name__ == "__main__":
    which = sys.argv[1:] or ["patch", "fused_bf16", "fused_f32"]
    if "check" in which:
        from bevformer_tpu.kernels.msda import ms_deform_attn_jnp
        r = ms_deform_attn_jnp(val, SHAPES, loc, w)
        o = mp._forward(val, SHAPES, loc, w, stride=8, halo=8)
        print("TPU f32 max abs diff:", float(jnp.abs(r - o).max()))
    if "patch" in which:
        timed(lambda v, l, ww: _msda_patch_chunked(v, SHAPES, l, ww),
              f"patch       Q={Q}")
    for name, dt_, s_, h_, ct_ in (
        ("fused_bf16", jnp.bfloat16, 8, 8, 256),
        ("fused_f32", jnp.float32, 8, 8, 256),
        ("fused_bf16_s16", jnp.bfloat16, 16, 8, 256),
        ("fused_bf16_s4", jnp.bfloat16, 4, 8, 256),
        ("fused_bf16_s4h13", jnp.bfloat16, 4, 13, 256),
        ("fused_bf16_s4h13_ct512", jnp.bfloat16, 4, 13, 512),
        ("fused_bf16_s4h13_ct1024", jnp.bfloat16, 4, 13, 1024),
    ):
        if name not in which:
            continue
        timed(
            lambda v, l, ww, dt_=dt_, s_=s_, h_=h_, ct_=ct_: mp._forward(
                v, SHAPES, l, ww, stride=s_, halo=h_, cap_tile=ct_,
                compute_dtype=dt_,
            ),
            f"{name:<12} Q={Q}",
        )
