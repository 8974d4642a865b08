"""Time bevformerv2 inference on the TPU (VERDICT r1 task 9: the V2 stack
previously had zero on-chip numbers).

Usage: [BENCH_CONFIG=bevformerv2-r50-t1] [STEPS=4] python tools/bench_v2.py
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

CONFIG = os.environ.get("BENCH_CONFIG", "bevformerv2-r50-t1")
STEPS = int(os.environ.get("STEPS", 4))


def main():
    from bevformer_tpu.configs import get_config
    from bevformer_tpu.models.detector_v2 import BEVFormerV2

    cfg = get_config(CONFIG).replace(dtype="bfloat16")
    model = BEVFormerV2(cfg=cfg)

    bs, cams = 1, cfg.data.num_cams
    h, w = cfg.data.img_size
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(bs, cams, h, w, 3).astype(np.float32) * 0.1)
    f = 1000.0
    intr = np.array([[f, 0, w / 2, 0], [0, f, h / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    extr = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1.0]])
    l2i = jnp.asarray(
        np.tile((intr @ extr)[None, None], (bs, cams, 1, 1)).astype(np.float32)
    )

    t0 = time.perf_counter()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, l2i)
    print(f"init: {time.perf_counter()-t0:.0f}s", flush=True)

    def step(p, imgs, l2i_):
        out = model.apply(p, imgs, l2i_)
        return sum(
            leaf.astype(jnp.float32).sum() for leaf in jax.tree.leaves(out)
        )

    def chained(p, imgs, l2i_):
        def body(c, _):
            return c + step(p, imgs + c * 1e-9, l2i_) * 1e-20, ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=STEPS)
        return c

    loop = jax.jit(chained)
    t0 = time.perf_counter()
    float(loop(params, images, l2i))
    print(f"compile+first: {time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    float(loop(params, images, l2i))
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{CONFIG} forward: {dt*1e3:.0f} ms/frame ({1/dt:.2f} FPS)", flush=True)


if __name__ == "__main__":
    main()
