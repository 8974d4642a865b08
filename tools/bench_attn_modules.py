"""Component profile at bevformer_base scale: SCA inner (fused vs patch),
the sort/permute overhead alone, and TSA (fused vs patch)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def timed(fn, args, label, reps=3):
    def chained(*a):
        def body(c, _):
            out = fn(*((a[0] + c * 1e-9,) + a[1:]))
            return c + out.ravel()[0].astype(jnp.float32) * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return c
    j = jax.jit(chained)
    t0 = time.perf_counter()
    r = float(j(*args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = float(j(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {dt*1e3:.1f} ms (compile {tc:.0f}s)", flush=True)
    return dt


which = set(sys.argv[1:] or ["sca", "sort", "tsa"])
rng = np.random.RandomState(0)

if "sca" in which or "sort" in which:
    from bevformer_tpu.models.attention import MSDeformableAttention3D

    b, q, e, nz = 6, 16000, 256, 4
    shapes = ((116, 200), (58, 100), (29, 50), (15, 25))
    k = sum(h * w for h, w in shapes)
    query = jnp.array(rng.randn(b, q, e) * 0.1, jnp.float32)
    value = jnp.array(rng.randn(b, k, e) * 0.1, jnp.float32)
    ref = jnp.array(rng.rand(b, q, nz, 2), jnp.float32)

    if "sort" in which:
        n = q * nz
        key_ = ref[..., 1].reshape(b, n)
        loc_a = jnp.array(rng.rand(b, n, 8, 4, 2, 2), jnp.float32)
        out_s = jnp.array(rng.rand(b, n, 256), jnp.float32)

        timed(lambda kk: jnp.argsort(kk, axis=1).astype(jnp.float32) + kk[:, :1],
              (key_,), "argsort [6,64000]")

        def perm_all(kk, loc_a, out_s):
            perm = jnp.argsort(kk, axis=1)
            inv = jnp.argsort(perm, axis=1)
            l = jnp.take_along_axis(loc_a, perm[:, :, None, None, None, None], 1)
            o = jnp.take_along_axis(out_s, inv[:, :, None], 1)
            return l.ravel()[:1] + o.ravel()[:1]
        timed(perm_all, (key_, loc_a, out_s), "sort+permute take_along_axis")

        def perm_vmap(kk, loc_a, out_s):
            perm = jnp.argsort(kk, axis=1)
            inv = jnp.argsort(perm, axis=1)
            l = jax.vmap(lambda a, p: jnp.take(a, p, axis=0))(loc_a, perm)
            o = jax.vmap(lambda a, p: jnp.take(a, p, axis=0))(out_s, inv)
            return l.ravel()[:1] + o.ravel()[:1]
        timed(perm_vmap, (key_, loc_a, out_s), "sort+permute vmap-row-take")

    if "sca" in which:
        # hoisted frame-constant sort (as the encoder provides per frame)
        from bevformer_tpu.models.attention import sca_capacity_precompute
        key_s = ref[..., 1].reshape(b, q * nz)
        perm_h = jnp.argsort(key_s, axis=1)
        inv_h = jnp.argsort(perm_h, axis=1)

        for mode in ("bf16", "off"):
            mod = MSDeformableAttention3D(
                embed_dims=e, num_heads=8, num_levels=4, num_points=8,
                fused_msda=mode,
            )
            params = None
            m0 = MSDeformableAttention3D(
                embed_dims=e, num_heads=8, num_levels=4, num_points=8,
                fused_msda="off",
            )
            params = jax.jit(
                lambda qq, vv, rr: m0.init(jax.random.PRNGKey(0), qq, vv,
                                           rr, shapes)
            )(query, value, ref)
            timed(
                lambda qq, params=params, mod=mod: mod.apply(
                    params, qq, value, ref, shapes
                ),
                (query,),
                f"SCA inner fused={mode} (inline sort)",
            )
            if mode != "off":
                timed(
                    lambda qq, params=params, mod=mod: mod.apply(
                        params, qq, value, ref, shapes, perm_h, inv_h
                    ),
                    (query,),
                    f"SCA inner fused={mode} (hoisted sort)",
                )

if "tsa" in which:
    from bevformer_tpu.models.attention import TemporalSelfAttention

    bs, bev_h, bev_w, e = 1, 200, 200, 256
    q = bev_h * bev_w
    query = jnp.array(rng.randn(bs, q, e) * 0.1, jnp.float32)
    vq = jnp.array(rng.randn(bs, 2, q, e) * 0.1, jnp.float32)
    pos = jnp.array(rng.randn(bs, q, e) * 0.1, jnp.float32)
    ref = jnp.array(rng.rand(bs, 2, q, 1, 2), jnp.float32)
    m0 = TemporalSelfAttention(embed_dims=e, num_heads=8, num_points=4,
                               fused_msda="off")
    params = jax.jit(
        lambda qq, v2, pp, rr: m0.init(jax.random.PRNGKey(0), qq, v2, pp,
                                       rr, bev_h, bev_w)
    )(query, vq, pos, ref)
    for mode in ("bf16", "off"):
        mod = TemporalSelfAttention(embed_dims=e, num_heads=8, num_points=4,
                                    fused_msda=mode)
        timed(
            lambda qq, mod=mod: mod.apply(params, qq, vq, pos, ref,
                                          bev_h, bev_w),
            (query,),
            f"TSA fused={mode}",
        )
