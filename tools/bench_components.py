"""Component timings of the full model at a given config on TPU:
backbone+neck (extract_feat), encoder-only forward (only_bev), and the
full forward — full-minus-bev approximates decoder+head cost.

Usage: [BENCH_CONFIG=bevformer_base] python tools/bench_components.py
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

CONFIG = os.environ.get("BENCH_CONFIG", "bevformer_base")
REPS = int(os.environ.get("REPS", 4))


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


def main():
    from bevformer_tpu.configs import get_config
    from bevformer_tpu.models import BEVFormer
    from __graft_entry__ import _example_inputs

    cfg = get_config(CONFIG).replace(dtype="bfloat16")
    nl = os.environ.get("BENCH_LAYERS")
    if nl is not None and nl != "":
        cfg = cfg.replace(encoder_layers=int(nl))  # 0 = glue-only intercept
    model = BEVFormer(cfg=cfg)
    images, can_bus, lidar2img, prev_bev, has_prev = _example_inputs(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), images, can_bus, lidar2img, prev_bev, has_prev
    )
    has_prev = jnp.ones_like(has_prev)

    def backbone(p, imgs, c):
        feats = model.apply(p, imgs + c * 1e-9, method="extract_feat")
        return sum(f.astype(jnp.float32).ravel()[0] for f in feats)

    def bev_only(p, imgs, c):
        bev = model.apply(
            p, imgs + c * 1e-9, can_bus, lidar2img, prev_bev, has_prev,
            only_bev=True,
        )
        return bev.astype(jnp.float32).ravel()[0]

    def full(p, imgs, c):
        out = model.apply(
            p, imgs + c * 1e-9, can_bus, lidar2img, prev_bev, has_prev
        )
        return out["all_cls_scores"].astype(jnp.float32).ravel()[0]

    t_bb = timed(backbone, (params, images), f"{CONFIG} backbone+neck")
    t_bev = timed(bev_only, (params, images), f"{CONFIG} bev-only (backbone+encoder)")
    print(f"encoder ~= {1e3*(t_bev - t_bb):.1f} ms", flush=True)
    if os.environ.get("BENCH_SKIP_FULL", "0") != "1":
        t_full = timed(full, (params, images), f"{CONFIG} full forward")
        print(
            f"decoder+head ~= {1e3*(t_full - t_bev):.1f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
