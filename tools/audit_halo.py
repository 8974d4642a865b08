"""Measure the minimal drop-free fused-kernel halo with REAL module
offsets (grid-init bias) at base scale.

The worst-case bound (offsets reach +-8 rows at every level) forces
halo 13, but the grid init is one-directional per head: head h's offsets
are s_h * (i+1), i < 8, all the same sign — the within-tile row spread is
~7|s_h| + anchor spread, so a smaller halo can still be exactly lossless.
Trained checkpoints are covered by the runtime audit + evaluator guard.

Run on CPU: python tools/audit_halo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from bevformer_tpu.kernels import msda_pallas as mp
from bevformer_tpu.models.attention import _grid_init_bias


def sca_drop(halo, stride=4, ct=512):
    """SCA at base scale: items = (query, z-anchor) pairs sorted by anchor
    row; offsets = grid-init bias (offset kernels are zero at init)."""
    h, l, ppa, nz = 8, 4, 2, 4
    shapes = ((116, 200), (58, 100), (29, 50), (15, 25))
    cap = 10112  # 0.25 ratio at 200x200
    qn = cap * nz
    rng = np.random.RandomState(0)
    base_y = np.sort(rng.rand(qn)).astype(np.float32)
    anchor = np.stack([rng.rand(qn).astype(np.float32), base_y], -1)
    bias = _grid_init_bias(h, l, ppa * nz).reshape(h, l, ppa * nz, 2)
    # kernel point p of an anchor-k item is original point p*nz + k
    bias_am = bias.reshape(h, l, ppa, nz, 2)
    norm = np.array([[w, hh] for hh, w in shapes], np.float32)
    k_of_item = np.tile(np.arange(nz), cap)  # z-anchor index per item row
    off = bias_am[:, :, :, k_of_item, :]  # [h, l, ppa, qn, 2]
    off = off / norm[None, :, None, None, :]
    loc = (
        anchor[None, None, None, :, :] + off
    ).transpose(3, 0, 1, 2, 4)[None]  # [1, qn, h, l, ppa, 2]
    w_ = np.full((1, qn, h, l, ppa), 1.0 / (l * ppa * nz), np.float32)
    dm = mp.window_drop_mass(
        shapes, jnp.asarray(loc.astype(np.float32)), jnp.asarray(w_),
        stride=stride, halo=halo, cap_tile=ct,
    )
    return sum(dm), float(w_.sum())


def tsa_drop(halo, stride=4, ct=512):
    h, l, p = 8, 1, 4
    rng = np.random.RandomState(1)
    gy, gx = np.meshgrid(np.arange(200), np.arange(200), indexing="ij")
    anchor = np.stack(
        [(gx.ravel() + 0.5) / 200, (gy.ravel() + 0.5) / 200], -1
    ).astype(np.float32)
    bias = _grid_init_bias(h, l, p).reshape(h, l, p, 2)
    off = bias / np.array([200.0, 200.0], np.float32)
    loc = (anchor[:, None, None, None, :] + off[None])[None]
    w_ = np.full((1, anchor.shape[0], h, l, p), 1.0 / (l * p), np.float32)
    dm = mp.window_drop_mass(
        ((200, 200),), jnp.asarray(loc.astype(np.float32)), jnp.asarray(w_),
        stride=stride, halo=halo, cap_tile=ct,
    )
    return sum(dm), float(w_.sum())


if __name__ == "__main__" and "perhead" not in sys.argv:
    for halo in (13, 11, 10, 9, 8, 7, 6):
        d, tot = sca_drop(halo)
        print(f"SCA halo={halo}: drop {d:.6f} / {tot:.0f}", flush=True)
    for halo in (6, 5, 4, 3):
        d, tot = tsa_drop(halo)
        print(f"TSA halo={halo}: drop {d:.6f} / {tot:.0f}", flush=True)


def sca_drop_hi(halo, stride=4, ct=512):
    """v3 heads-inner kernel: per-query-block windows shared across all
    points and heads — the halo must cover the full grid-init spread."""
    from bevformer_tpu.kernels import msda_hi as mh

    h, l, ppa, nz = 8, 4, 2, 4
    shapes = ((116, 200), (58, 100), (29, 50), (15, 25))
    cap = 10112
    qn = cap * nz
    rng = np.random.RandomState(0)
    base_y = np.sort(rng.rand(qn)).astype(np.float32)
    anchor = np.stack([rng.rand(qn).astype(np.float32), base_y], -1)
    bias = _grid_init_bias(h, l, ppa * nz).reshape(h, l, ppa, nz, 2)
    norm = np.array([[w, hh] for hh, w in shapes], np.float32)
    k_of_item = np.tile(np.arange(nz), cap)
    off = bias[:, :, :, k_of_item, :] / norm[None, :, None, None, :]
    # flat (l, h, ppa, 2) channels
    loc = (anchor[None, None, None, :, :] + off)  # [h, l, ppa, qn, 2]
    loc = loc.transpose(3, 1, 0, 2, 4).reshape(1, qn, l * h * ppa * 2)
    w_ = np.full((1, qn, l * h * ppa), 1.0 / (l * ppa * nz), np.float32)
    dm = mh.window_drop_mass_hi(
        shapes, jnp.asarray(loc.astype(np.float32)), jnp.asarray(w_),
        heads=h, points=ppa, stride=stride, halo=halo, cap_tile=ct,
    )
    return float(dm.sum()), float(w_.sum())


def tsa_drop_hi(halo, stride=4, ct=512):
    from bevformer_tpu.kernels import msda_hi as mh

    h, l, p = 8, 1, 4
    rng = np.random.RandomState(1)
    gy, gx = np.meshgrid(np.arange(200), np.arange(200), indexing="ij")
    anchor = np.stack(
        [(gx.ravel() + 0.5) / 200, (gy.ravel() + 0.5) / 200], -1
    ).astype(np.float32)
    bias = _grid_init_bias(h, l, p).reshape(h, l, p, 2)
    off = bias / np.array([200.0, 200.0], np.float32)
    loc = (anchor[:, None, None, None, :] + off[None])  # [q, h, l, p, 2]
    loc = loc.transpose(0, 2, 1, 3, 4).reshape(1, anchor.shape[0], -1)
    w_ = np.full((1, anchor.shape[0], l * h * p), 1.0 / (l * p), np.float32)
    dm = mh.window_drop_mass_hi(
        ((200, 200),), jnp.asarray(loc.astype(np.float32)),
        jnp.asarray(w_), heads=h, points=p, stride=stride, halo=halo,
        cap_tile=ct,
    )
    return float(dm.sum()), float(w_.sum())


def per_head_halos(drop_fn, h, cand, wide):
    """Minimal drop-free halo PER HEAD: drop mass is additive over heads
    and head hd's windows depend only on halo[hd], so sweep one head at a
    time with every other head held at a known-drop-free `wide` halo."""
    out = []
    for hd in range(h):
        best = wide
        for hv in cand:  # descending
            halos = tuple(hv if i == hd else wide for i in range(h))
            d, _ = drop_fn(halos)
            if float(d) == 0.0:
                best = hv
            else:
                break
        out.append(best)
        print(f"  head {hd}: halo {best}", flush=True)
    return tuple(out)


if __name__ == "__main__" and "perhead" in sys.argv:
    print("SCA per-head (stride 4):", flush=True)
    sca_h = per_head_halos(
        lambda hs: sca_drop_hi(hs), 8, list(range(9, -1, -1)), 9
    )
    print(f"SCA halos = {sca_h}", flush=True)
    print("TSA per-head (stride 2):", flush=True)
    tsa_h = per_head_halos(
        lambda hs: tsa_drop_hi(hs, stride=2), 8, list(range(7, -1, -1)), 7
    )
    print(f"TSA halos = {tsa_h}", flush=True)
