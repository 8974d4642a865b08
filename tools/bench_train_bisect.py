"""Bisect the train-step cost (tiny measured 14.6 s/iter): forward loss
only vs grad without Hungarian vs full grad.

Usage: [BENCH_CONFIG=bevformer_tiny] python tools/bench_train_bisect.py
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

CONFIG = os.environ.get("BENCH_CONFIG", "bevformer_tiny")


def main():
    from bevformer_tpu.configs import get_config
    from bevformer_tpu.models import BEVFormer
    from bevformer_tpu.runtime import train

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
    state = train.init_state(model, _P(), key, batch)
    params = state.params

    def timeit(fn, label, *args):
        jf = jax.jit(fn)
        t0 = time.perf_counter()
        r = jax.tree.map(lambda x: x.block_until_ready(), jf(*args))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(2):
            r = jf(*args)
        jax.tree.map(lambda x: x.block_until_ready(), r)
        # relay block_until_ready returns early; fetch a scalar
        leaf = jax.tree.leaves(r)[0]
        float(jnp.asarray(leaf).ravel()[0])
        dt = (time.perf_counter() - t0) / 2
        print(f"{label}: {dt*1e3:.0f} ms (compile {tc:.0f}s)", flush=True)

    # 1. forward loss only
    timeit(lambda p: train.loss_fn(model, p, batch, key)[0], "loss fwd only", params)

    # 2. grad of a no-matching surrogate (mean of head outputs)
    def surrogate(p):
        preds = model.apply(
            p, batch.images[:, -1], batch.can_bus[:, -1],
            batch.lidar2img[:, -1],
            jnp.zeros((bs, cfg.bev_h * cfg.bev_w, cfg.embed_dims), jnp.float32),
            jnp.zeros((bs,), bool),
            training=True,
            rngs={"dropout": key, "grid_mask": key},
        )
        return (
            preds["all_cls_scores"].astype(jnp.float32).mean()
            + preds["all_bbox_preds"].astype(jnp.float32).mean()
        )

    timeit(jax.grad(surrogate), "grad, single frame, no hungarian", params)

    # 2b. encoder-only surrogate (isolates encoder backward)
    def surrogate_bev(p):
        bev = model.apply(
            p, batch.images[:, -1], batch.can_bus[:, -1],
            batch.lidar2img[:, -1],
            jnp.zeros((bs, cfg.bev_h * cfg.bev_w, cfg.embed_dims), jnp.float32),
            jnp.zeros((bs,), bool),
            only_bev=True,
            training=True,
            rngs={"dropout": key, "grid_mask": key},
        )
        return bev.astype(jnp.float32).mean()

    timeit(jax.grad(surrogate_bev), "grad, encoder-only surrogate", params)

    # 2c. same but fused msda disabled (XLA patch fwd+bwd)
    model_off = type(model)(cfg=cfg.replace(fused_msda="off"))

    def surrogate_off(p):
        bev = model_off.apply(
            p, batch.images[:, -1], batch.can_bus[:, -1],
            batch.lidar2img[:, -1],
            jnp.zeros((bs, cfg.bev_h * cfg.bev_w, cfg.embed_dims), jnp.float32),
            jnp.zeros((bs,), bool),
            only_bev=True,
            training=True,
            rngs={"dropout": key, "grid_mask": key},
        )
        return bev.astype(jnp.float32).mean()

    timeit(jax.grad(surrogate_off), "grad, encoder-only, fused OFF", params)

    # 2d. no remat variant
    model_nr = type(model)(cfg=cfg.replace(use_remat=False))

    def surrogate_nr(p):
        bev = model_nr.apply(
            p, batch.images[:, -1], batch.can_bus[:, -1],
            batch.lidar2img[:, -1],
            jnp.zeros((bs, cfg.bev_h * cfg.bev_w, cfg.embed_dims), jnp.float32),
            jnp.zeros((bs,), bool),
            only_bev=True,
            training=True,
            rngs={"dropout": key, "grid_mask": key},
        )
        return bev.astype(jnp.float32).mean()

    timeit(jax.grad(surrogate_nr), "grad, encoder-only, no remat", params)

    # 3. full loss grad (history + hungarian)
    timeit(
        jax.grad(lambda p: train.loss_fn(model, p, batch, key)[0]),
        "grad, full loss_fn", params,
    )


class _P:
    def init(self, params):
        return ()


if __name__ == "__main__" and not os.environ.get("FINER"):
    main()


def finer():
    """Second-stage bisect: isolate backbone vs encoder-layer count vs
    grid-mask in the single-frame encoder-only gradient."""
    from bevformer_tpu.configs import get_config
    from bevformer_tpu.models import BEVFormer
    from bevformer_tpu.runtime import train

    import time as _t

    cfg = get_config(CONFIG).replace(use_remat=True)
    bs, t = 1, cfg.data.queue_length
    cams = cfg.data.num_cams
    h, w = cfg.data.img_size
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(bs, cams, h, w, 3).astype(np.float32) * 0.1)
    can = jnp.asarray(rng.randn(bs, 18).astype(np.float32) * 0.1)
    f = 1000.0
    intr = np.array([[f, 0, w / 2, 0], [0, f, h / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    extr = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1.0]])
    l2i = jnp.asarray(np.tile((intr @ extr)[None, None], (bs, cams, 1, 1)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    def timeit(fn, label, *args):
        jf = jax.jit(fn)
        t0 = _t.perf_counter()
        r = jf(*args)
        jax.tree.map(lambda x: x.block_until_ready(), r)
        tc = _t.perf_counter() - t0
        t0 = _t.perf_counter()
        for _ in range(2):
            r = jf(*args)
        leaf = jax.tree.leaves(r)[0]
        float(jnp.asarray(leaf).ravel()[0])
        dt = (_t.perf_counter() - t0) / 2
        print(f"{label}: {dt*1e3:.0f} ms (compile {tc:.0f}s)", flush=True)

    def make(cfgv):
        model = BEVFormer(cfg=cfgv)
        prev = jnp.zeros((bs, cfgv.bev_h * cfgv.bev_w, cfgv.embed_dims), jnp.float32)
        has = jnp.zeros((bs,), bool)

        def lossf(p):
            bev = model.apply(
                p, imgs, can, l2i, prev, has, only_bev=True, training=True,
                rngs={"dropout": key, "grid_mask": key},
            )
            return bev.astype(jnp.float32).mean()

        params = jax.jit(model.init)(key, imgs, can, l2i, prev, has)
        return model, params, lossf

    model, params, lossf = make(cfg)

    def bb_loss(p):
        feats = model.apply(p, imgs, method="extract_feat")
        return sum(f_.astype(jnp.float32).mean() for f_ in feats)

    timeit(jax.grad(bb_loss), "grad backbone+neck only", params)

    _, p1, l1 = make(cfg.replace(encoder_layers=1))
    timeit(jax.grad(l1), "grad bev, 1 encoder layer", p1)

    _, p0, l0 = make(cfg.replace(use_grid_mask=False))
    timeit(jax.grad(l0), "grad bev, grid_mask off", p0)


if __name__ == "__main__" and os.environ.get("FINER"):
    finer()
