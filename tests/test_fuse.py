"""Eval-time conv+BN fusion (runtime/fuse.py) — exactness on both BN
flavours (reference tool: tools/misc/fuse_conv_bn.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevformer_tpu.models.resnet import ResNet
from bevformer_tpu.models.vovnet import VoVNet
from bevformer_tpu.runtime.fuse import fuse_conv_bn


def _randomize(tree, key):
    """Perturb every float leaf so BN stats/affines are non-trivial."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    out = []
    for leaf, k in zip(leaves, keys):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            out.append(
                leaf + 0.1 * jax.random.normal(k, leaf.shape, leaf.dtype)
            )
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


@pytest.mark.parametrize("norm", ["frozen", "bn"])
def test_resnet_fuse_exact(norm):
    model = ResNet(depth=10, norm=norm, frozen_stages=-1)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(1), x)
    variables = _randomize(variables, jax.random.PRNGKey(2))
    # running stats must be positive-variance
    if "batch_stats" in variables:
        variables["batch_stats"] = jax.tree_util.tree_map(
            lambda a: jnp.abs(a) + 0.5, variables["batch_stats"]
        )
    ref = model.apply(variables, x)
    fused = fuse_conv_bn(variables)
    got = model.apply(fused, x)
    for r, g in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        r = np.asarray(r)
        # randomized weights drive activations to ~1e4 over 10 layers, so
        # rounding-order differences are ~1e-6 of the activation SCALE —
        # compare against that, not elementwise rtol (tiny outputs lose
        # all relative precision to cancellation)
        scale = max(1.0, float(np.abs(r).max()))
        np.testing.assert_allclose(r, np.asarray(g), rtol=1e-4,
                                   atol=1e-4 * scale)
    # the fold actually happened: BN affines are identity afterwards
    flat = jax.tree_util.tree_leaves_with_path(fused["params"])
    n_scales = 0
    for path, leaf in flat:
        keys = [getattr(p, "key", "") for p in path]
        if keys[-1] == "scale" and any("bn" in k for k in keys):
            n_scales += 1
            assert np.allclose(np.asarray(leaf), 1.0), keys
    assert n_scales > 0


def test_vovnet_fuse_exact():
    model = VoVNet(norm="frozen")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(1), x)
    variables = _randomize(variables, jax.random.PRNGKey(2))
    ref = model.apply(variables, x)
    got = model.apply(fuse_conv_bn(variables), x)
    for r, g in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        r = np.asarray(r)
        scale = max(1.0, float(np.abs(r).max()))
        np.testing.assert_allclose(r, np.asarray(g), rtol=1e-4,
                                   atol=1e-4 * scale)
