#!/usr/bin/env python
"""FPS benchmark CLI — mirrors `tools/analysis_tools/benchmark.py`.

Measures steady-state single-chip inference throughput of a config with the
video loop chained inside jit (see bench.py for why: the axon relay makes
block_until_ready unreliable, so timing uses a host fetch on a scan chain).

  python tools/benchmark.py bevformer_tiny [--samples 20] [--dtype bfloat16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--samples", type=int, default=20)
    p.add_argument("--dtype", default=None, choices=[None, "float32", "bfloat16"])
    p.add_argument(
        "--streams", type=int, default=1,
        help="N independent videos batched per step (bs=N, N prev_bev "
        "carries). Reports AGGREGATE frames/sec — a throughput number, NOT "
        "comparable to the bs=1 per-frame latency the driver metric uses",
    )
    p.add_argument("--cfg-options", nargs="*", default=[])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from bevformer_tpu.configs import get_config
    from bevformer_tpu.configs.config import apply_overrides
    from bevformer_tpu.models import BEVFormer
    from __graft_entry__ import _example_inputs

    cfg = get_config(args.config)
    if args.cfg_options:
        cfg = apply_overrides(cfg, dict(kv.split("=", 1) for kv in args.cfg_options))
    if args.dtype:
        cfg = cfg.replace(dtype=args.dtype)

    model = BEVFormer(cfg=cfg)
    images, can_bus, lidar2img, prev_bev, has_prev = _example_inputs(
        cfg, bs=args.streams
    )
    t0 = time.time()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), images, can_bus, lidar2img, prev_bev, has_prev
    )
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"init {time.time() - t0:.1f}s; {n_params / 1e6:.1f}M params")
    has_prev = jnp.ones_like(has_prev)

    # params/images as jit args (closure constants blow the compile-relay
    # payload limit for large models)
    def chained(p, imgs, pb):
        def body(c, _):
            out = model.apply(p, imgs, can_bus, lidar2img, c, has_prev)
            return out["bev_embed"].astype(jnp.float32), ()
        bev, _ = jax.lax.scan(body, pb, None, length=args.samples)
        return bev.sum()

    n = args.samples
    loop = jax.jit(chained)
    t0 = time.time()
    float(loop(params, images, prev_bev))
    print(f"compile+warmup {time.time() - t0:.1f}s")
    t0 = time.time()
    float(loop(params, images, prev_bev))
    dt = (time.time() - t0) / n
    if args.streams > 1:
        print(
            f"{args.config} dtype={cfg.dtype} streams={args.streams}: "
            f"{dt * 1e3:.2f} ms/step x {args.streams} frames -> "
            f"{args.streams / dt:.2f} frames/sec AGGREGATE "
            f"(batched-video throughput; bs=1 latency is the comparable "
            f"driver metric)"
        )
    else:
        print(
            f"{args.config} dtype={cfg.dtype}: {dt * 1e3:.2f} ms/frame "
            f"-> {1.0 / dt:.2f} FPS (1 chip, 6-cam video inference)"
        )


if __name__ == "__main__":
    main()
