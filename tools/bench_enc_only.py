"""Encoder-ONLY timings on fixed inputs: separates the per-frame glue
(point_sampling, capacity precompute, value staging) from the layer scan
by timing BEVFormerEncoder.apply at several depths without the backbone.

Usage: [LAYERS="1 2 6"] [REPS=16] python tools/bench_enc_only.py
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

REPS = int(os.environ.get("REPS", 16))


def timed(fn, args, label):
    def chained(a0, *rest):
        def body(c, _):
            out = fn(a0, c, *rest)
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
    from bevformer_tpu.models.encoder import BEVFormerEncoder
    from __graft_entry__ import _example_inputs

    cfg = get_config(os.environ.get("BENCH_CONFIG", "bevformer_base"))
    cfg = cfg.replace(dtype="bfloat16")
    _, can_bus, lidar2img, _, _ = _example_inputs(cfg)
    rng = np.random.RandomState(0)
    e = cfg.embed_dims
    shapes = []
    hh, ww = (x // 8 for x in cfg.data.img_size)
    for _ in range(cfg.num_feature_levels):
        shapes.append((hh, ww))
        hh, ww = -(-hh // 2), -(-ww // 2)
    k = sum(a * b for a, b in shapes)
    q = cfg.bev_h * cfg.bev_w
    value = jnp.array(rng.randn(1, cfg.data.num_cams, k, e) * 0.1, jnp.bfloat16)
    bev_query = jnp.array(rng.randn(1, q, e) * 0.1, jnp.bfloat16)
    bev_pos = jnp.array(rng.randn(1, q, e) * 0.1, jnp.bfloat16)
    prev_bev = jnp.array(rng.randn(1, q, e) * 0.1, jnp.bfloat16)
    has_prev = jnp.ones((1,), jnp.float32)
    shift = jnp.zeros((1, 2), jnp.float32)

    if os.environ.get("GLUE", "0") == "1":
        # the encoder's per-frame fixed work alone (everything outside the
        # layer scan), with every product consumed so nothing DCEs
        from bevformer_tpu.core import geometry
        from bevformer_tpu.models.attention import sca_capacity_precompute

        pc = cfg.pc_range
        npil = cfg.num_points_in_pillar

        def glue(l2i_, c, shift_):
            l2i_ = l2i_ + c * 0
            ref_3d = geometry.reference_points_3d(
                cfg.bev_h, cfg.bev_w, pc[5] - pc[2], npil, bs=1
            )
            ref_2d = geometry.reference_points_2d(cfg.bev_h, cfg.bev_w, bs=1)
            rpc, bm = geometry.point_sampling(
                ref_3d, pc, l2i_, tuple(cfg.data.img_size)
            )
            shift_ref = ref_2d + shift_[:, None, None, :]
            hybrid = jnp.stack([shift_ref, ref_2d], axis=1)
            pre = sca_capacity_precompute(rpc, bm, cfg.sca_capacity_ratio)
            acc = rpc.ravel()[0] + hybrid.ravel()[0]
            for v_ in jax.tree_util.tree_leaves(pre):
                acc = acc + v_.ravel()[0].astype(jnp.float32)
            return acc
        timed(glue, (lidar2img.astype(jnp.float32), shift), "encoder glue (fixed/frame)")
        return

    for nl in [int(x) for x in os.environ.get("LAYERS", "1 2 6").split()]:
        enc = BEVFormerEncoder(
            num_layers=nl,
            embed_dims=e,
            num_heads=cfg.num_heads,
            feedforward_channels=cfg.feedforward_channels,
            num_cams=cfg.data.num_cams,
            num_levels=cfg.num_feature_levels,
            num_points_in_pillar=cfg.num_points_in_pillar,
            pc_range=cfg.pc_range,
            sca_capacity_ratio=cfg.sca_capacity_ratio,
            fused_msda=cfg.fused_spec(audit=False),
            dtype=jnp.bfloat16,
        )
        params = jax.jit(enc.init, static_argnums=(8, 9, 10, 11))(
            jax.random.PRNGKey(0), bev_query, value, bev_pos, prev_bev,
            has_prev, shift, lidar2img, tuple(cfg.data.img_size),
            tuple(shapes), cfg.bev_h, cfg.bev_w,
        )

        def run(v_, c, p_):
            out = enc.apply(
                p_, bev_query, v_ + c.astype(v_.dtype) * 0, bev_pos,
                prev_bev, has_prev, shift, lidar2img,
                tuple(cfg.data.img_size), tuple(shapes),
                cfg.bev_h, cfg.bev_w,
            )
            return out.astype(jnp.float32).ravel()[0]
        timed(run, (value, params), f"encoder apply L={nl}")


if __name__ == "__main__":
    main()
