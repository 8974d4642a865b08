"""Isolate the DCN cost in the base backbone: time R101 backbone at base
resolution with dcn_stages=(2,3) (shipped) vs () (plain 3x3 convs).

Usage: python tools/bench_dcn.py
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

from bevformer_tpu.models.resnet import ResNet

REPS = int(os.environ.get("REPS", 4))
H, W, B = 928, 1600, 6


def timed(fn, args, label):
    def chained(*a):
        def body(c, _):
            out = fn(*((a[0],) + a[1:] + (c,)))
            return c + out * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return c
    j = jax.jit(chained)
    t0 = time.perf_counter()
    float(j(*args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(j(*args))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label}: {dt*1e3:.1f} ms (compile {tc:.0f}s)", flush=True)
    return dt


def run(dcn_stages, label, dcn_impl="off", clip_y=6.0):
    model = ResNet(
        depth=101, out_indices=(1, 2, 3), dcn_stages=dcn_stages,
        dcn_impl=dcn_impl, dcn_clip_y=clip_y, dtype=jnp.bfloat16,
    )
    x = jnp.zeros((B, H, W, 3), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    def fwd(p, xx, c):
        outs = model.apply(p, xx + c.astype(xx.dtype) * 1e-9)
        return sum(o.astype(jnp.float32).ravel()[0] for o in outs)

    timed(fwd, (params, x), label)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "gather"):
        run((2, 3), "R101-DCN(2,3) base-res gather")
    if which in ("all", "fused"):
        run((2, 3), "R101-DCN(2,3) base-res fused-bf16", dcn_impl="bf16")
    if which in ("all", "plain"):
        run((), "R101 plain base-res")
    if which == "clip3":
        run((2, 3), "R101-DCN fused-bf16 clip3", dcn_impl="bf16", clip_y=3.0)
    if which == "clip4":
        run((2, 3), "R101-DCN fused-bf16 clip4", dcn_impl="bf16", clip_y=4.0)
    if which == "ct1024":
        run((2, 3), "R101-DCN fused-bf16 ct1024", dcn_impl="bf16")
    if which == "stride8":
        run((2, 3), "R101-DCN fused-bf16 stride8", dcn_impl="bf16")
