"""Time the full MSDeformableAttention3D module (SCA inner) at base scale
on TPU, fused bf16 path, sort hoisted (as the encoder runs it).

Usage: python tools/bench_sca_module.py
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

from bevformer_tpu.models.attention import MSDeformableAttention3D

b, q, e, nz = 6, 16000, 256, 4
SHAPES = ((116, 200), (58, 100), (29, 50), (15, 25))
k = sum(a * c for a, c in SHAPES)
rng = np.random.RandomState(0)
query = jnp.array(rng.randn(b, q, e) * 0.1, jnp.float32)
value = jnp.array(rng.randn(b, k, e) * 0.1, jnp.bfloat16)
ref = jnp.array(rng.rand(b, q, nz, 2), jnp.float32)
key_ = ref[..., 1].reshape(b, q * nz)
perm = jnp.argsort(key_, axis=1)
inv = jnp.argsort(perm, axis=1)

mod = MSDeformableAttention3D(
    embed_dims=e, num_heads=8, num_levels=4, num_points=8,
    fused_msda="bf16", dtype=jnp.bfloat16,
)
params = jax.jit(
    lambda: mod.init(jax.random.PRNGKey(0), query, value, ref, SHAPES,
                     sort_perm=perm, sort_inv=inv)
)()


def fwd(p, qq, c):
    out = mod.apply(p, qq + c * 1e-9, value, ref, SHAPES,
                    sort_perm=perm, sort_inv=inv)
    return out.astype(jnp.float32).ravel()[0]


def timed(reps=4):
    def chained(p, qq):
        def body(c, _):
            return c + fwd(p, qq, c) * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return c
    j = jax.jit(chained)
    t0 = time.perf_counter(); float(j(params, query))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter(); float(j(params, query))
    dt = (time.perf_counter() - t0) / reps
    print(f"SCA inner module (bf16 fused): {dt*1e3:.1f} ms "
          f"(compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    timed()
