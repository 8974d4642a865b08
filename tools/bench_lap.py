"""Time the on-device Hungarian (JV) solver and the full assigner at
train-loss shapes — suspected dominant cost of the tiny train step
(augmenting paths are sequential while_loops: O(G) iterations each with
O(G*Q) work but latency-bound on TPU).

Usage: python tools/bench_lap.py [G ...]
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

from bevformer_tpu.core.lap import hungarian_assign

Q = 900


def timed(g, reps=8):
    rng = np.random.RandomState(0)
    cost = jnp.asarray(rng.rand(Q, g).astype(np.float32))
    ng = jnp.int32(g)

    def chained(c0):
        def body(carry, _):
            a = hungarian_assign(c0 + carry * 1e-9, ng)
            return carry + a.sum().astype(jnp.float32) * 1e-9, None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return out

    j = jax.jit(chained)
    t0 = time.perf_counter(); float(j(cost)); tc = time.perf_counter() - t0
    t0 = time.perf_counter(); float(j(cost))
    dt = (time.perf_counter() - t0) / reps
    print(f"hungarian_assign Q={Q} G={g}: {dt*1e3:.1f} ms "
          f"(compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    for g in [int(a) for a in sys.argv[1:]] or (8, 32, 64):
        timed(g)
