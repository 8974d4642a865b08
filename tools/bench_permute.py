"""Row-permute formulations at SCA scale: [6, 64000, C] gathered by a
per-batch permutation. take_along_axis vs vmap-take vs one-hot matmul.
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

b, n = 6, 64000
rng = np.random.RandomState(0)
perm = jnp.array(
    np.stack([rng.permutation(n) for _ in range(b)]), jnp.int32
)


def timed(fn, args, label, reps=4):
    def chained(*a):
        def body(c, _):
            out = fn(*((a[0] + c.astype(a[0].dtype) * 1e-9,) + a[1:]))
            return c + out.ravel()[0].astype(jnp.float32) * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return c
    j = jax.jit(chained)
    t0 = time.perf_counter(); float(j(*args)); tc = time.perf_counter() - t0
    t0 = time.perf_counter(); float(j(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {dt*1e3:.1f} ms (compile {tc:.0f}s)", flush=True)


for c, dt_ in ((192, jnp.float32), (196, jnp.bfloat16)):
    x = jnp.array(rng.randn(b, n, c), dt_)
    timed(
        lambda xx: jnp.take_along_axis(xx, perm[:, :, None], axis=1),
        (x,), f"take_along_axis [6,64000,{c}] {dt_.__name__}",
    )
    timed(
        jax.vmap(lambda xx, pp: xx[pp]),
        (x, perm), f"vmap-index     [6,64000,{c}] {dt_.__name__}",
    )
    timed(
        lambda xx: jax.vmap(lambda xr, pr: jnp.take(xr, pr, axis=0))(xx, perm),
        (x,), f"vmap-take      [6,64000,{c}] {dt_.__name__}",
    )
