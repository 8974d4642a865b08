"""Golden regression: the mini-model forward must stay bit-stable.

Guards the deformable-attention kernel rewrites and module refactors:
any numerics change (beyond fp32 noise) to the encoder/decoder/head path
shows up here immediately. Regenerate intentionally with
`python tests/regen_golden.py` and review the diff.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_model import mini_config
import pytest

# compile-heavy (full model / Pallas kernel graphs): slow tier
pytestmark = pytest.mark.slow

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_mini_forward.npz")


def test_mini_forward_matches_golden():
    from bevformer_tpu.models import BEVFormer

    cfg = mini_config()
    model = BEVFormer(cfg=cfg)
    rng = np.random.RandomState(42)
    bs, cams = 1, 6
    h, w = cfg.data.img_size
    images = jnp.array(rng.randn(bs, cams, h, w, 3) * 0.5, jnp.float32)
    can_bus = jnp.array(rng.randn(bs, 18) * 0.1, jnp.float32)
    f = 100.0
    intr = np.array([[f, 0, w / 2, 0], [0, f, h / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    extr = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1.0]])
    l2i = jnp.array(np.tile((intr @ extr)[None, None], (bs, cams, 1, 1)), jnp.float32)
    prev = jnp.array(
        rng.randn(bs, cfg.bev_h * cfg.bev_w, cfg.embed_dims) * 0.1, jnp.float32
    )
    hasp = jnp.ones((bs,), bool)
    params = model.init(jax.random.PRNGKey(7), images, can_bus, l2i, prev, hasp)
    out = model.apply(params, images, can_bus, l2i, prev, hasp)

    g = np.load(GOLDEN)
    np.testing.assert_allclose(
        np.asarray(out["all_cls_scores"]), g["cls"], rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["all_bbox_preds"]), g["box"], rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["bev_embed"][0, :8, :8]), g["bev_slice"],
        rtol=2e-4, atol=2e-4,
    )
