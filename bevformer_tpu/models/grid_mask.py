"""GridMask image augmentation (training-time structured dropout).

Reproduces `models/utils/grid_mask.py:70-124` with the reference's shipped
hyper-parameters (`detectors/bevformer.py:52-53`): use_h/use_w=True,
rotate=1 (angle randint(1)==0, i.e. no rotation), offset=False, ratio=0.5,
mode=1, prob=0.7.

Semantics (mode=1): a 1.5x canvas is striped every `d` pixels with stripe
width l = clip(int(d*0.5+0.5), 1, d-1) in both axes, center-cropped, and the
*union* of row/col stripes is KEPT (mask = 1 - grid). One mask per batch,
one coin flip per batch — exactly as the reference (it draws numpy randoms
once per forward).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_mask(
    rng: jax.Array,
    images: jnp.ndarray,  # [n, h, w, c]
    prob: float = 0.7,
    ratio: float = 0.5,
) -> jnp.ndarray:
    n, h, w, c = images.shape
    k_apply, k_d, k_st_h, k_st_w = jax.random.split(rng, 4)

    apply = jax.random.uniform(k_apply, ()) < prob
    d = jax.random.randint(k_d, (), 2, h)  # np.random.randint(2, h)
    l = jnp.clip((d * ratio + 0.5).astype(jnp.int32), 1, d - 1)
    st_h = jax.random.randint(k_st_h, (), 0, 1 << 30) % d
    st_w = jax.random.randint(k_st_w, (), 0, 1 << 30) % d

    hh, ww = int(1.5 * h), int(1.5 * w)
    off_h, off_w = (hh - h) // 2, (ww - w) // 2

    def in_stripe(coord, canvas, off, st):
        # canvas coords y+off; stripes at [d*i+st, d*i+st+l) for i<canvas//d
        yc = coord + off
        i = (yc - st) // d
        phase = (yc - st) - i * d
        return (phase >= 0) & (phase < l) & (i >= 0) & (i < canvas // d)

    rows = in_stripe(jnp.arange(h), hh, off_h, st_h)  # [h]
    cols = in_stripe(jnp.arange(w), ww, off_w, st_w)  # [w]
    keep = rows[:, None] | cols[None, :]  # mode=1: keep the stripe union
    keep = keep | ~apply
    return images * keep[None, :, :, None].astype(images.dtype)
