"""Stage decomposition of the fused SCA inner at base scale:
1. Dense offsets/weights + softmax + locations build
2. + anchor transpose + sorted permute gather (loc+w fused)
3. kernel _forward alone (presorted inputs)
4. unsort gather + anchor sum alone
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

from bevformer_tpu.kernels import msda_pallas as mp

b, q, e, nz, h, l, ppa = 6, 16000, 256, 4, 8, 4, 2
p = nz * ppa
SHAPES = ((116, 200), (58, 100), (29, 50), (15, 25))
k = sum(a * c for a, c in SHAPES)
rng = np.random.RandomState(0)
query = jnp.array(rng.randn(b, q, e) * 0.1, jnp.float32)
wo = jnp.array(rng.randn(e, h * l * p * 2) * 0.01, jnp.float32)
ww_ = jnp.array(rng.randn(e, h * l * p) * 0.01, jnp.float32)
ref = jnp.array(rng.rand(b, q, nz, 2), jnp.float32)
key_ = ref[..., 1].reshape(b, q * nz)
perm = jnp.argsort(key_, axis=1)
inv = jnp.argsort(perm, axis=1)
val = jnp.array(rng.randn(b, k, h, 32) * 0.1, jnp.float32)


def timed(fn, args, label, reps=4):
    def chained(*a):
        def body(c, _):
            out = fn(*((a[0] + c * 1e-9,) + a[1:]))
            return c + out.ravel()[0].astype(jnp.float32) * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return c
    j = jax.jit(chained)
    t0 = time.perf_counter(); float(j(*args)); tc = time.perf_counter() - t0
    t0 = time.perf_counter(); float(j(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {dt*1e3:.1f} ms (compile {tc:.0f}s)", flush=True)


def dense_loc(qq):
    offs = (qq @ wo).reshape(b, q, h, l, p, 2)
    w = jax.nn.softmax((qq @ ww_).reshape(b, q, h, l * p), -1)
    norm = jnp.array([[c, a] for a, c in SHAPES], jnp.float32)
    offs = offs / norm[None, None, None, :, None, :]
    loc = (ref[:, :, None, None, None, :, :]
           + offs.reshape(b, q, h, l, ppa, nz, 2)).reshape(b, q, h, l, p, 2)
    return loc, w.reshape(b, q, h, l, p)


timed(lambda qq: dense_loc(qq)[0], (query,), "1. dense+softmax+locations")


def with_permute(qq):
    loc, w = dense_loc(qq)
    loc_a = (loc.reshape(b, q, h, l, ppa, nz, 2)
             .transpose(0, 1, 5, 2, 3, 4, 6).reshape(b, q * nz, -1))
    w_a = (w.reshape(b, q, h, l, ppa, nz)
           .transpose(0, 1, 5, 2, 3, 4).reshape(b, q * nz, -1))
    lw = jnp.take_along_axis(
        jnp.concatenate([loc_a, w_a], -1), perm[:, :, None], axis=1)
    return lw


timed(with_permute, (query,), "2. (1)+anchor transpose+sorted gather")

loc_s = jnp.array(rng.rand(b, q * nz, h, l, ppa, 2), jnp.float32)
# make y coherent for the kernel stage
base_y = (jnp.arange(q * nz) + 0.5) / (q * nz)
loc_s = loc_s.at[..., 1].set(
    base_y[None, :, None, None, None]
    + (loc_s[..., 1] - 0.5) * (6.0 / 116)
)
w_s = jnp.array(rng.rand(b, q * nz, h, l, ppa), jnp.float32)

import os
CT = int(os.environ.get("CT", 512))
HALO = int(os.environ.get("HALO", 13))
timed(
    lambda v, ls, ws: mp._forward(
        v, SHAPES, ls, ws, stride=4, halo=HALO, cap_tile=CT,
        compute_dtype=jnp.bfloat16,
    ),
    (val, loc_s, w_s),
    f"3. kernel _forward (s4 h{HALO} ct{CT} bf16)",
)

out_s = jnp.array(rng.randn(b, q * nz, e) * 0.1, jnp.float32)
timed(
    lambda o: jnp.take_along_axis(o, inv[:, :, None], axis=1)
    .reshape(b, q, nz, e).sum(2),
    (out_s,),
    "4. unsort gather + anchor sum",
)
