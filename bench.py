#!/usr/bin/env python
"""Benchmark: bevformer_base inference throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "frames/sec", "vs_baseline": N}

A frame is one 6-camera nuScenes sample at base resolution (928x1600),
full video inference step (backbone + FPN + BEV encoder w/ temporal state +
decoder + head). Timing is measured with the work chained inside a single
jitted lax.scan (the prev_bev carry makes every step data-dependent on the
last, so no overlap tricks) and a host fetch at the end — this is required
on the axon relay, where block_until_ready returns early.

vs_baseline: the reference publishes no FPS (BASELINE.md); the widely used
reference point is ~3 frames/sec for bevformer_base on A100 with the
mmcv CUDA kernel (paper reports 1.7 FPS on V100). vs_baseline = ours / 3.0,
i.e. >1.0 means faster than the A100 reference per chip.
"""

import json
import os
import sys
import time

A100_BASELINE_FPS = 3.0
N_STEPS = int(os.environ.get("BENCH_STEPS", "8"))
CONFIG = os.environ.get("BENCH_CONFIG", "bevformer_base")


def main():
    import jax

    # persistent compile cache: the first-ever run pays the (long, 1-core)
    # XLA compile; subsequent runs (e.g. the driver's) hit the cache
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from bevformer_tpu.configs import get_config
    from bevformer_tpu.models import BEVFormer
    from __graft_entry__ import _example_inputs

    cfg = get_config(CONFIG)
    # inference in bf16 (the TPU-native precision; projection/sampling code
    # paths force fp32 internally)
    cfg = cfg.replace(dtype="bfloat16")
    model = BEVFormer(cfg=cfg)

    images, can_bus, lidar2img, prev_bev, has_prev = _example_inputs(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), images, can_bus, lidar2img, prev_bev, has_prev
    )
    has_prev = jnp.ones_like(has_prev)

    # NOTE: params/images must be jit ARGUMENTS — closed-over arrays are
    # baked into the HLO as constants, and a base-sized model (~280 MB fp32)
    # exceeds the compile relay's request size limit (HTTP 413)
    def step_p(p, imgs, pb):
        out = model.apply(p, imgs, can_bus, lidar2img, pb, has_prev)
        return out["bev_embed"].astype(jnp.float32), out["all_cls_scores"].sum()

    try:
        def chained(p, imgs, pb):
            def body(c, _):
                # thread the carry into the IMAGES too: with loop-invariant
                # imgs XLA hoists the whole backbone+neck out of the scan
                # and the bench times only the carry-dependent encoder
                # (measured: base "0.958 FPS" vs a true 0.67)
                imgs_c = imgs + (c[0, 0, 0] * 1e-24).astype(imgs.dtype)
                return step_p(p, imgs_c, c)[0], ()
            bev, _ = jax.lax.scan(body, pb, None, length=N_STEPS)
            return bev.sum()

        loop = jax.jit(chained)
        float(loop(params, images, prev_bev))  # compile + warm up
        t0 = time.time()
        float(loop(params, images, prev_bev))
        dt = (time.time() - t0) / N_STEPS
    except Exception:
        # fall back to per-call timing with a host fetch per step (adds
        # ~30 ms relay latency per frame — conservative)
        one = jax.jit(step_p)
        pb, s = one(params, images, prev_bev)
        float(s)
        t0 = time.time()
        for _ in range(N_STEPS):
            pb, s = one(params, images, pb)
            float(s)
        dt = (time.time() - t0) / N_STEPS
    fps = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": (
                    f"{CONFIG} 6-cam inference throughput (1 TPU chip); "
                    "vs_baseline = ours / 3.0 FPS (ESTIMATED A100 figure — "
                    "the reference publishes no FPS)"
                ),
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps / A100_BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
