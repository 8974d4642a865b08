"""DCN taps-inner kernel decomposition probe at base stage-3 shapes.

Splits one ModulatedDeformConv's cost into: offset/mask conv (XLA),
payload prep (XLA), window prep (XLA), the pallas sampling kernel itself
(inputs precomputed), the 9C x F weight matmul, and the full fused path —
the DCN analogue of tools/bench_hi_probe.py.

Env:  C (channels, 256=stage3/512=stage4) OH OW (58 100 / 29 50)
      CLIP STRIDE CT CC REPS
Usage: python tools/bench_dcn_probe.py [modes...]
Modes: full kern payprep wprep conv offconv  (default: all)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from bevformer_tpu.kernels import dcn_pallas as dp

B = 6
C = int(os.environ.get("C", "256"))
OH = int(os.environ.get("OH", "58"))
OW = int(os.environ.get("OW", "100"))
CLIP = float(os.environ.get("CLIP", "3"))
STRIDE = int(os.environ.get("STRIDE", "8"))
CT = int(os.environ.get("CT", "512"))
CC = int(os.environ.get("CC", "64"))
REPS = int(os.environ.get("REPS", "8"))
CD = jnp.bfloat16

rng = np.random.RandomState(0)
x = jnp.array(rng.randn(B, OH, OW, C) * 0.1, CD)
off = jnp.array(rng.randn(B, OH, OW, 9, 2) * 1.0, jnp.float32)
mask = jnp.array(rng.rand(B, OH, OW, 9), jnp.float32)
w = jnp.array(rng.randn(9 * C, C) * 0.02, jnp.float32)


def build(mode):
    n = OH * OW

    def fn(xx, oy, ox, m, carry):
        xx = xx + carry.astype(CD) * 1e-9
        if mode == "nop":
            # harness floor: relay per-call overhead / REPS + carry chain
            return xx.astype(jnp.float32).ravel()[0] * 1e-20
        if mode.startswith("offconv"):
            # stand-in for the conv_offset 3x3 conv (27 outputs)
            cout = 128 if "128" in mode else 27
            dt = jnp.bfloat16 if "bf16" in mode else jnp.float32
            k = jnp.zeros((3, 3, C, cout), dt)
            om = jax.lax.conv_general_dilated(
                xx.astype(dt), k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            return om.astype(jnp.float32).sum() * 1e-20
        if mode == "fused":
            out = dp.dcn_conv_pallas(
                xx, oy, ox, m, w, conv_stride=1, clip_y=CLIP,
                cap_tile=CT, stride=STRIDE, cc=CC, compute_dtype=CD,
            )
            return out.astype(jnp.float32).ravel()[0] * 1e-20
        if mode in ("full", "conv"):
            sampled = dp.dcn_sample_pallas(
                xx, oy, ox, m, conv_stride=1, clip_y=CLIP,
                cap_tile=CT, stride=STRIDE, cc=CC, compute_dtype=CD,
            )
            if mode == "conv":
                out = jnp.einsum(
                    "bin,io->bno", sampled.astype(jnp.float32), w
                )
                return out.sum() * 1e-20
            return sampled.astype(jnp.float32).ravel()[0] * 1e-20
        if mode == "wprep":
            wrows = dp._wrows_for(CT, OW, 1, CLIP, STRIDE)
            wins = dp.prepare_dcn_windows(
                xx, stride=STRIDE, wrows=wrows, cc=CC, compute_dtype=CD
            )
            return wins.astype(jnp.float32).sum() * 1e-20
        # wprep decomposition: which stage of prepare_dcn_windows is slow?
        if mode in ("wpad", "wtrans", "wgroup", "wstack"):
            from bevformer_tpu.kernels.msda_pallas import _round_up
            b, h_, w_, c = xx.shape
            wrows = dp._wrows_for(CT, OW, 1, CLIP, STRIDE)
            wwp = _round_up(w_, 128)
            nw = max(-(-h_ // STRIDE), 1)
            g = wrows // STRIDE
            hpad = (nw + g - 1) * STRIDE
            xp = jnp.pad(
                xx.astype(CD),
                ((0, 0), (0, hpad - h_), (0, wwp - w_), (0, 0)),
            )
            if mode == "wpad":
                return xp.astype(jnp.float32).sum() * 1e-20
            img = xp.reshape(b, hpad, wwp, c // CC, CC)
            t = img.transpose(0, 3, 1, 4, 2)  # [b, ncc, hpad, cc, wwp]
            if mode == "wtrans":
                return t.astype(jnp.float32).sum() * 1e-20
            tg = t.reshape(b, c // CC, hpad // STRIDE, STRIDE * CC, wwp)
            if mode == "wgroup":
                # grouped (non-overlapping) layout only — what the g-ref
                # kernel variant would consume
                return tg.astype(jnp.float32).sum() * 1e-20
            wins = jnp.stack(
                [tg[:, :, o: o + nw] for o in range(g)], axis=3
            ).reshape(b, c // CC, nw, wrows * CC, wwp)
            return wins.astype(jnp.float32).sum() * 1e-20
        raise ValueError(mode)

    return fn


def timed(label, fn, *args):
    def chained(*a):
        def body(c, _):
            return fn(*a, c), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return c
    j = jax.jit(chained)
    t0 = time.perf_counter()
    float(j(*args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(j(*args))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label}: {dt*1e3:.2f} ms/layer (compile {tc:.0f}s)", flush=True)


def main():
    modes = sys.argv[1:] or ["full", "conv", "wprep", "offconv"]
    oy, ox = off[..., 0], off[..., 1]
    for m in modes:
        timed(m, build(m), x, oy, ox, mask)


if __name__ == "__main__":
    main()
