"""msda vs torch.grid_sample oracle.

The oracle reimplements the semantics of mmcv's pure-PyTorch fallback
(bilinear grid_sample per level, align_corners=False, zeros padding,
attention-weighted sum) directly with torch.nn.functional.grid_sample, which
is the reference's CPU execution path and therefore the ground truth.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from bevformer_tpu.kernels import ms_deform_attn_jnp


def torch_oracle(value, spatial_shapes, locations, weights):
    """value [B,K,H,D], locations [B,Q,H,L,P,2], weights [B,Q,H,L,P]."""
    b, k, h, d = value.shape
    _, q, _, l, p, _ = locations.shape
    value = torch.from_numpy(value)
    locations = torch.from_numpy(locations)
    weights = torch.from_numpy(weights)

    value_list = value.split([hh * ww for hh, ww in spatial_shapes], dim=1)
    sampling_grids = 2 * locations - 1
    sampling_value_list = []
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        # [B, hw, H, D] -> [B*H, D, hh, ww]
        v = (
            value_list[lvl]
            .flatten(2)
            .transpose(1, 2)
            .reshape(b * h, d, hh, ww)
        )
        g = sampling_grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)
        sampled = F.grid_sample(
            v, g, mode="bilinear", padding_mode="zeros", align_corners=False
        )
        sampling_value_list.append(sampled)
    attn = weights.transpose(1, 2).reshape(b * h, 1, q, l * p)
    out = (
        (torch.stack(sampling_value_list, dim=-2).flatten(-2) * attn)
        .sum(-1)
        .view(b, h * d, q)
    )
    return out.transpose(1, 2).contiguous().numpy()


@pytest.mark.parametrize(
    "shapes,heads,points",
    [
        (((15, 25),), 8, 8),
        (((16, 22), (8, 11)), 8, 4),
        (((29, 50), (15, 25), (8, 13), (4, 7)), 8, 8),
    ],
)
def test_msda_matches_grid_sample(shapes, heads, points):
    rng = np.random.RandomState(0)
    b, q, d = 2, 37, 32
    k = sum(h * w for h, w in shapes)
    l = len(shapes)
    value = rng.randn(b, k, heads, d).astype(np.float32)
    # cover in-bounds, edge, and out-of-bounds locations
    loc = rng.uniform(-0.2, 1.2, size=(b, q, heads, l, points, 2)).astype(
        np.float32
    )
    w = rng.rand(b, q, heads, l, points).astype(np.float32)
    w /= w.reshape(b, q, heads, -1).sum(-1).reshape(b, q, heads, 1, 1)

    expected = torch_oracle(value, shapes, loc, w)
    got = np.asarray(
        ms_deform_attn_jnp(jnp.array(value), shapes, jnp.array(loc), jnp.array(w))
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "shapes,heads,points",
    [
        (((15, 25),), 8, 8),
        (((29, 50), (15, 25), (8, 13), (4, 7)), 8, 8),
    ],
)
def test_patch_gather_matches_reference(shapes, heads, points):
    from bevformer_tpu.kernels.msda import ms_deform_attn_patch

    rng = np.random.RandomState(7)
    b, q, d = 2, 53, 32
    k = sum(h * w for h, w in shapes)
    l = len(shapes)
    value = rng.randn(b, k, heads, d).astype(np.float32)
    loc = rng.uniform(-0.5, 1.5, size=(b, q, heads, l, points, 2)).astype(
        np.float32
    )
    w = rng.rand(b, q, heads, l, points).astype(np.float32)
    a = np.asarray(
        ms_deform_attn_jnp(jnp.array(value), shapes, jnp.array(loc), jnp.array(w))
    )
    c = np.asarray(
        ms_deform_attn_patch(
            jnp.array(value), shapes, jnp.array(loc), jnp.array(w)
        )
    )
    np.testing.assert_allclose(c, a, rtol=1e-5, atol=1e-5)


def test_msda_grad_finite():
    import jax

    shapes = ((8, 12),)
    b, q, h, d, p = 1, 9, 2, 8, 4
    k = sum(hh * ww for hh, ww in shapes)
    rng = np.random.RandomState(1)
    value = jnp.array(rng.randn(b, k, h, d), jnp.float32)
    loc = jnp.array(rng.uniform(0, 1, (b, q, h, 1, p, 2)), jnp.float32)
    w = jax.nn.softmax(jnp.array(rng.randn(b, q, h, 1, p), jnp.float32))

    def f(v, l2, w2):
        return ms_deform_attn_jnp(v, shapes, l2, w2).sum()

    gv, gl, gw = jax.grad(f, argnums=(0, 1, 2))(value, loc, w)
    for g in (gv, gl, gw):
        assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(gv).sum()) > 0
    assert float(jnp.abs(gl).sum()) > 0


@pytest.mark.parametrize(
    "shapes,heads,points,band_rows",
    [
        (((15, 25),), 8, 8, 4),
        (((16, 22), (8, 11)), 4, 4, 4),
        (((29, 50), (15, 25), (8, 13), (4, 7)), 8, 8, 5),
    ],
)
def test_banded_matches_reference(shapes, heads, points, band_rows):
    """Round-2 banded MXU prototype: exact when capacity is not exceeded.

    Uniform random locations with a generous capacity_ratio guarantee no
    band overflow, so the result must match the oracle bit-for-bit-ish.
    """
    from bevformer_tpu.kernels.msda import ms_deform_attn_banded

    rng = np.random.RandomState(3)
    b, q, d = 2, 41, 32
    k = sum(h * w for h, w in shapes)
    l = len(shapes)
    value = rng.randn(b, k, heads, d).astype(np.float32)
    loc = rng.uniform(-0.3, 1.3, size=(b, q, heads, l, points, 2)).astype(
        np.float32
    )
    w = rng.rand(b, q, heads, l, points).astype(np.float32)

    a = np.asarray(
        ms_deform_attn_jnp(jnp.array(value), shapes, jnp.array(loc), jnp.array(w))
    )
    c = np.asarray(
        ms_deform_attn_banded(
            jnp.array(value), shapes, jnp.array(loc), jnp.array(w),
            band_rows=band_rows, capacity_ratio=6.0,
        )
    )
    np.testing.assert_allclose(c, a, rtol=1e-4, atol=1e-5)
