"""Time a REAL training step on the TPU (VERDICT r1 task 6).

Measures compile time, s/iter and device memory for a single-chip train
step. Default config bevformer_tiny (queue_length 3 history unroll +
Hungarian loss + AdamW); BENCH_CONFIG=bevformer_base for the flagship
(28.5 GB/GPU in the reference — on a 16 GB v5e this requires
use_remat + bf16, expect it to be tight).

Usage: [BENCH_CONFIG=...] [STEPS=3] python tools/bench_train_step.py
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
STEPS = int(os.environ.get("STEPS", 3))


def main():
    from bevformer_tpu.configs import get_config
    from bevformer_tpu.models import BEVFormer
    from bevformer_tpu.runtime import optim, train

    cfg = get_config(CONFIG)
    overrides = dict(use_remat=True)
    if os.environ.get("BENCH_DTYPE"):
        overrides["dtype"] = os.environ["BENCH_DTYPE"]
    cfg = cfg.replace(**overrides)
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
        images=jnp.asarray(
            rng.randn(bs, t, cams, h, w, 3).astype(np.float32) * 0.1
        ),
        can_bus=jnp.asarray(rng.randn(bs, t, 18).astype(np.float32) * 0.1),
        lidar2img=jnp.asarray(l2i.astype(np.float32)),
        prev_exists=jnp.ones((bs, t), bool),
        gt_boxes=jnp.asarray(gt_boxes),
        gt_labels=jnp.asarray(rng.randint(0, 10, (bs, g)).astype(np.int32)),
        num_gt=jnp.asarray(np.full((bs,), g, np.int32)),
    )

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state = train.init_state(model, _Placeholder(), key, batch)
    tx, _ = optim.make_optimizer(cfg.optim, state.params, total_steps=1000)
    state = train.TrainState(state.step, state.params, tx.init(state.params))
    print(f"init: {time.perf_counter()-t0:.0f}s", flush=True)

    step_fn = train.make_train_step(model, tx)
    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch, key)
    total = float(metrics["total"])
    t_compile = time.perf_counter() - t0
    print(f"compile+first step: {t_compile:.0f}s loss={total:.3f}", flush=True)

    t0 = time.perf_counter()
    for i in range(STEPS):
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, i))
    total = float(metrics["total"])  # host sync
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{CONFIG} train step: {dt*1e3:.0f} ms/iter (loss {total:.3f})", flush=True)

    try:
        stats = jax.devices()[0].memory_stats()
        peak = stats.get("peak_bytes_in_use", 0) / 1e9
        lim = stats.get("bytes_limit", 0) / 1e9
        print(f"device memory: peak {peak:.2f} GB / limit {lim:.2f} GB", flush=True)
    except Exception as e:  # relay may not expose stats
        print(f"memory_stats unavailable: {e}", flush=True)


class _Placeholder:
    def init(self, params):
        return ()

    def update(self, grads, state, params=None):
        return grads, state


if __name__ == "__main__":
    main()
