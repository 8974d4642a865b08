"""Time the FULL bevformerv2-r50-t1 train step on the TPU (mono head on,
GroupDETR-11 => 11 Hungarian problems/image): compile time + s/iter via a
scan-chained grad with a global-norm carry (relay-safe timing).

Usage: [BENCH_CONFIG=bevformerv2-r50-t1] [REPS=2] python tools/bench_train_v2.py
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

CONFIG = os.environ.get("BENCH_CONFIG", "bevformerv2-r50-t1")
REPS = int(os.environ.get("REPS", "2"))


def main():
    from bevformer_tpu.configs import get_config
    from bevformer_tpu.models.detector_v2 import BEVFormerV2
    from bevformer_tpu.runtime.train_v2 import (
        BatchV2, init_state_v2, loss_fn,
    )

    cfg = get_config(CONFIG).replace(use_remat=True)
    model = BEVFormerV2(cfg=cfg)
    bs = 1
    t = len(cfg.frames)
    cams = cfg.data.num_cams
    h, w = cfg.data.img_size
    g = 24
    rng = np.random.RandomState(0)
    gt_boxes = rng.randn(bs, g, 9).astype(np.float32)
    gt_boxes[..., 3:6] = np.abs(gt_boxes[..., 3:6]) + 0.5

    mono_targets = None
    inv_k = None
    if cfg.num_mono_levels:
        # synthetic per-camera mono targets in the padded layout the DD3D
        # loss consumes (same schema as tests/test_dd3d._mk_targets)
        n, gm = bs * cams, 16
        boxes = np.zeros((n, gm, 4), np.float32)
        x1 = rng.uniform(0, w * 0.6, (n, gm))
        y1 = rng.uniform(0, h * 0.6, (n, gm))
        boxes[..., 0], boxes[..., 1] = x1, y1
        boxes[..., 2] = x1 + rng.uniform(20, w * 0.4, (n, gm))
        boxes[..., 3] = y1 + rng.uniform(20, h * 0.4, (n, gm))
        quat = rng.randn(n, gm, 4).astype(np.float32)
        quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
        mono_targets = {
            "boxes2d": jnp.array(boxes),
            "classes": jnp.array(rng.randint(0, 10, (n, gm)), jnp.int32),
            "num_gt": jnp.array(rng.randint(1, gm + 1, (n,)), jnp.int32),
            "img_valid": jnp.ones((n,), bool),
            "box3d_quat": jnp.array(quat),
            "box3d_ctr": jnp.array(
                (boxes[..., :2] + boxes[..., 2:]) / 2, jnp.float32
            ),
            "box3d_depth": jnp.array(
                rng.uniform(5, 40, (n, gm)), jnp.float32
            ),
            "box3d_size": jnp.array(
                np.abs(rng.randn(n, gm, 3)) + 1.0, jnp.float32
            ),
            "attributes": jnp.array(rng.randint(0, 4, (n, gm)), jnp.int32),
            "speeds": jnp.array(rng.uniform(0, 10, (n, gm)), jnp.float32),
        }
        f = 0.8 * w
        ik = np.linalg.inv(
            np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]])
        )
        inv_k = jnp.array(
            np.tile(ik[None, None], (bs, cams, 1, 1)), jnp.float32
        )

    batch = BatchV2(
        images=jnp.array(rng.randn(bs, t, cams, h, w, 3) * 0.1, jnp.float32),
        lidar2img=jnp.broadcast_to(jnp.eye(4), (bs, t, cams, 4, 4)).astype(
            jnp.float32
        ),
        frame_valid=jnp.ones((bs, t), bool),
        flip=jnp.zeros((bs,), bool),
        bda_mat=jnp.broadcast_to(jnp.eye(2), (bs, 2, 2)).astype(jnp.float32),
        gt_boxes=jnp.array(gt_boxes),
        gt_labels=jnp.array(rng.randint(0, 10, (bs, g)), jnp.int32),
        num_gt=jnp.array([g] * bs, jnp.int32),
        inv_intrinsics=inv_k,
        mono_targets=mono_targets,
    )

    class _Tx:
        def init(self, params):
            return ()

    print("init...", flush=True)
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state = init_state_v2(model, _Tx(), key, batch)
    print(f"init done {time.perf_counter()-t0:.0f}s", flush=True)

    def grad_fn(params, images, batch_rest):
        b = batch_rest._replace(images=images)
        (_, _), g_ = jax.value_and_grad(
            lambda p: loss_fn(model, p, state.batch_stats, b, key),
            has_aux=True,
        )(params)
        return g_

    def chained(p, im, br):
        def body(c, _):
            g_ = grad_fn(p, im + c.astype(im.dtype) * 1e-24, br)
            return optax.global_norm(g_).astype(jnp.float32) * 1e-20 + c, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return c

    jf = jax.jit(chained)
    t0 = time.perf_counter()
    float(jf(state.params, batch.images, batch))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(jf(state.params, batch.images, batch))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{CONFIG} FULL train grad: {dt*1e3:.0f} ms/iter "
          f"(compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
