"""Reliable train-grad timings: scan-chained (carry perturbs the images,
global-norm of ALL grads feeds the carry) so the relay cannot return
early and XLA cannot DCE any gradient.

Usage: [BENCH_CONFIG=bevformer_tiny] python tools/bench_train2.py \
         [backbone bev bev1 full]
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
import optax

CONFIG = os.environ.get("BENCH_CONFIG", "bevformer_tiny")
REPS = int(os.environ.get("REPS", "2"))


def timed(grad_fn, params, imgs, label, *rest):
    """grad_fn(params, imgs, *rest) -> grad pytree. `rest` are passed as
    jit ARGUMENTS — closed-over arrays get baked into the HLO as
    constants and blow the compile relay's size limit (HTTP 413)."""
    def chained(p, im, *r):
        def body(c, _):
            g = grad_fn(p, im + c.astype(im.dtype) * 1e-24, *r)
            return optax.global_norm(g).astype(jnp.float32) * 1e-20 + c, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return c
    jf = jax.jit(chained)
    t0 = time.perf_counter()
    float(jf(params, imgs, *rest))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(jf(params, imgs, *rest))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label}: {dt*1e3:.0f} ms (compile {tc:.0f}s)", flush=True)


def main():
    from bevformer_tpu.configs import get_config
    from bevformer_tpu.models import BEVFormer
    from bevformer_tpu.runtime import train

    which = set(sys.argv[1:]) or {"backbone", "bev", "full"}
    cfg = get_config(CONFIG).replace(use_remat=True)
    model = BEVFormer(cfg=cfg)
    bs, t, g = 1, cfg.data.queue_length, 16
    cams = cfg.data.num_cams
    h, w = cfg.data.img_size
    rng = np.random.RandomState(0)
    gt_boxes = rng.randn(bs, g, 9).astype(np.float32)
    gt_boxes[..., 3:6] = np.abs(gt_boxes[..., 3:6]) + 0.5
    f = 1000.0
    intr = np.array([[f, 0, w / 2, 0], [0, f, h / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    extr = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1.0]])
    l2i = np.tile((intr @ extr)[None, None, None], (bs, t, cams, 1, 1))
    batch = train.Batch(
        images=jnp.asarray(rng.randn(bs, t, cams, h, w, 3).astype(np.float32) * 0.1),
        can_bus=jnp.asarray(rng.randn(bs, t, 18).astype(np.float32) * 0.1),
        lidar2img=jnp.asarray(l2i.astype(np.float32)),
        prev_exists=jnp.ones((bs, t), bool),
        gt_boxes=jnp.asarray(gt_boxes),
        gt_labels=jnp.asarray(rng.randint(0, 10, (bs, g)).astype(np.int32)),
        num_gt=jnp.asarray(np.full((bs,), g, np.int32)),
    )
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        key, batch.images[:, -1], batch.can_bus[:, -1], batch.lidar2img[:, -1],
        jnp.zeros((bs, cfg.bev_h * cfg.bev_w, cfg.embed_dims), jnp.float32),
        jnp.zeros((bs,), bool),
    )

    if "backbone" in which:
        def bb_grad(p, im):
            def loss(pp):
                feats = model.apply(pp, im, method="extract_feat")
                return sum(f_.astype(jnp.float32).mean() for f_ in feats)
            return jax.grad(loss)(p)
        timed(bb_grad, params, batch.images[:, -1], "grad backbone+neck")

    if "bev" in which or "bev1" in which:
        def make_bev_grad(m):
            def bev_grad(p, im):
                def loss(pp):
                    bev = m.apply(
                        pp, im, batch.can_bus[:, -1], batch.lidar2img[:, -1],
                        jnp.zeros((bs, m.cfg.bev_h * m.cfg.bev_w,
                                   m.cfg.embed_dims), jnp.float32),
                        jnp.zeros((bs,), bool), only_bev=True, training=True,
                        rngs={"dropout": key, "grid_mask": key},
                    )
                    return bev.astype(jnp.float32).mean()
                return jax.grad(loss)(p)
            return bev_grad
        if "bev" in which:
            timed(make_bev_grad(model), params, batch.images[:, -1],
                  "grad bev-only (full encoder)")
        if "bev1" in which:
            m1 = BEVFormer(cfg=cfg.replace(encoder_layers=1))
            timed(make_bev_grad(m1), params if cfg.encoder_layers == 1 else
                  jax.jit(m1.init)(
                      key, batch.images[:, -1], batch.can_bus[:, -1],
                      batch.lidar2img[:, -1],
                      jnp.zeros((bs, cfg.bev_h * cfg.bev_w, cfg.embed_dims),
                                jnp.float32),
                      jnp.zeros((bs,), bool)),
                  batch.images[:, -1], "grad bev-only (1 layer)")

    if "full" in which:
        def full_grad(p, im, bt):
            b2 = bt._replace(
                images=bt.images.at[:, -1].set(
                    im.reshape(bs, cams, h, w, 3)))
            return jax.grad(lambda pp: train.loss_fn(model, pp, b2, key)[0])(p)
        timed(full_grad, params, batch.images[:, -1],
              "grad full loss_fn (queue + hungarian)", batch)


if __name__ == "__main__":
    main()
