"""Fused Pallas DCNv2 sampling vs the XLA bilinear-gather oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevformer_tpu.kernels import dcn_pallas as dp

# compile-heavy (full model / Pallas kernel graphs): slow tier
pytestmark = pytest.mark.slow


def _inputs(rng, b, h, w, c, oh, ow, off_scale=3.0):
    x = jnp.array(rng.randn(b, h, w, c), jnp.float32)
    off_y = jnp.array(rng.randn(b, oh, ow, 9) * off_scale, jnp.float32)
    off_x = jnp.array(rng.randn(b, oh, ow, 9) * off_scale, jnp.float32)
    mask = jnp.array(rng.rand(b, oh, ow, 9), jnp.float32)
    return x, off_y, off_x, mask


@pytest.mark.parametrize("conv_stride", [1, 2])
def test_fused_matches_oracle(conv_stride):
    rng = np.random.RandomState(0)
    b, h, w, c = 2, 18, 20, 64
    oh, ow = h // conv_stride, w // conv_stride
    x, off_y, off_x, mask = _inputs(rng, b, h, w, c, oh, ow)
    ref = dp._sample_ref(
        x, off_y, off_x, mask, conv_stride=conv_stride, clip_y=6.0
    )
    out = dp.dcn_sample_pallas(
        x, off_y, off_x, mask, conv_stride=conv_stride, clip_y=6.0,
        cap_tile=128, cc=32, compute_dtype=jnp.float32,
    )
    assert out.shape == ref.shape == (b, 9 * c, oh * ow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_oob_and_modulation():
    """Horizontal offsets pushing samples out of the image follow
    grid_sample zeros semantics; mask=0 taps contribute nothing."""
    rng = np.random.RandomState(1)
    b, h, w, c = 1, 16, 12, 32
    x, off_y, off_x, mask = _inputs(rng, b, h, w, c, h, w, off_scale=0.0)
    off_x = off_x + jnp.array(
        rng.choice([-30.0, 0.0, 30.0], size=off_x.shape), jnp.float32
    )
    mask = mask.at[..., 4].set(0.0)
    ref = dp._sample_ref(x, off_y, off_x, mask, conv_stride=1, clip_y=6.0)
    out = dp.dcn_sample_pallas(
        x, off_y, off_x, mask, conv_stride=1, clip_y=6.0,
        cap_tile=128, cc=32, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_gradients_consistent():
    """custom_vjp backward = gradient of the clipped reference formulation."""
    rng = np.random.RandomState(2)
    b, h, w, c = 1, 10, 12, 32
    x, off_y, off_x, mask = _inputs(rng, b, h, w, c, h, w, off_scale=1.0)

    def loss_fused(xx, oy, ox, mm):
        out = dp.dcn_sample_pallas(
            xx, oy, ox, mm, conv_stride=1, clip_y=6.0, cap_tile=128,
            cc=32, compute_dtype=jnp.float32,
        )
        return (out.astype(jnp.float32) ** 2).sum()

    def loss_ref(xx, oy, ox, mm):
        out = dp._sample_ref(xx, oy, ox, mm, conv_stride=1, clip_y=6.0)
        return (out**2).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, off_y, off_x, mask)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, off_y, off_x, mask)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4
        )


def test_conv_folded_matches_unfolded_and_grads():
    """dcn_conv_pallas (conv weight contracted IN-kernel) == sample kernel
    + einsum, forward and grads (incl. dweight)."""
    rng = np.random.RandomState(5)
    b, h, w, c, cout = 1, 12, 14, 32, 24
    x, off_y, off_x, mask = _inputs(rng, b, h, w, c, h, w, off_scale=1.5)
    weight = jnp.array(rng.randn(9 * c, cout) * 0.1, jnp.float32)

    def loss_folded(xx, oy, ox, mm, ww):
        out = dp.dcn_conv_pallas(
            xx, oy, ox, mm, ww, conv_stride=1, clip_y=6.0, cap_tile=128,
            cc=32, compute_dtype=jnp.float32,
        )
        return (out.astype(jnp.float32) ** 2).sum()

    def loss_unfolded(xx, oy, ox, mm, ww):
        s = dp._sample_ref(xx, oy, ox, mm, conv_stride=1, clip_y=6.0)
        out = jnp.einsum("bin,io->bon", s, ww)
        return (out**2).sum()

    argnums = (0, 1, 2, 3, 4)
    out_f = dp.dcn_conv_pallas(
        x, off_y, off_x, mask, weight, conv_stride=1, clip_y=6.0,
        cap_tile=128, cc=32, compute_dtype=jnp.float32,
    )
    s = dp._sample_ref(x, off_y, off_x, mask, conv_stride=1, clip_y=6.0)
    out_r = jnp.einsum("bin,io->bon", s, weight)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_r), rtol=1e-4, atol=1e-4
    )
    gf = jax.grad(loss_folded, argnums=argnums)(x, off_y, off_x, mask, weight)
    gr = jax.grad(loss_unfolded, argnums=argnums)(
        x, off_y, off_x, mask, weight
    )
    for name, a, b_ in zip(("x", "off_y", "off_x", "mask", "weight"), gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-3, atol=2e-3, err_msg=name
        )


def test_modulated_deform_conv_fused_vs_gather():
    """Full module: fused Pallas path == XLA gather path (random weights,
    nonzero offsets via non-zero conv_offset init)."""
    import flax.linen as nn

    from bevformer_tpu.models.resnet import ModulatedDeformConv

    rng = np.random.RandomState(3)
    x = jnp.array(rng.randn(2, 16, 20, 64), jnp.float32)
    mod_g = ModulatedDeformConv(features=48, stride=1, impl="off")
    params = mod_g.init(jax.random.PRNGKey(0), x)
    # random offset weights so the deformable path is actually exercised
    params = jax.tree_util.tree_map(
        lambda p: jnp.array(rng.randn(*p.shape) * 0.05, p.dtype), params
    )
    ref = mod_g.apply(params, x)
    mod_f = ModulatedDeformConv(features=48, stride=1, impl="fp32")
    out = mod_f.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )
