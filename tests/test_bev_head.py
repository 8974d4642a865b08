"""BEVHead / FreeAnchor: anchors, codec round-trip, loss behavior."""

import numpy as np
import jax
import jax.numpy as jnp

from bevformer_tpu.models import bev_head
from tests.test_model import mini_config
import pytest

# compile-heavy (full model / Pallas kernel graphs): slow tier
pytestmark = pytest.mark.slow


def test_anchor_grid():
    anc = np.asarray(bev_head.generate_anchors(4, 6, (-48, -48, -5, 48, 48, 3)))
    assert anc.shape == (4 * 6 * 20, 9)
    # centers span the range symmetrically
    assert abs(anc[:, 0].mean()) < 1e-4 and abs(anc[:, 1].mean()) < 1e-4
    assert anc[:, 3].min() > 0.3


def test_delta_codec_roundtrip():
    rng = np.random.RandomState(0)
    anc = jnp.array(rng.randn(50, 9) * 2, jnp.float32)
    anc = anc.at[:, 3:6].set(jnp.abs(anc[:, 3:6]) + 1.0)
    boxes = jnp.array(rng.randn(50, 9) * 2, jnp.float32)
    boxes = boxes.at[:, 3:6].set(jnp.abs(boxes[:, 3:6]) + 0.5)
    deltas = bev_head.encode_deltas(anc, boxes)
    back = bev_head.decode_deltas(anc, deltas)
    np.testing.assert_allclose(np.asarray(back), np.asarray(boxes), atol=1e-4)


def test_bev_head_forward_and_loss():
    cfg = mini_config()
    head = bev_head.BEVHead(cfg=cfg)
    rng = np.random.RandomState(0)
    bev = jnp.array(rng.randn(1, cfg.bev_h * cfg.bev_w, cfg.embed_dims) * 0.1,
                    jnp.float32)
    params = head.init(jax.random.PRNGKey(0), bev)
    preds = head.apply(params, bev)
    na = len(bev_head.ANCHOR_SIZES) * len(bev_head.ROTATIONS)
    assert preds["cls"].shape == (1, cfg.bev_h * cfg.bev_w * na, cfg.num_classes)

    g = 6
    boxes = rng.randn(1, g, 9).astype(np.float32)
    boxes[..., :2] *= 20
    boxes[..., 3:6] = np.abs(boxes[..., 3:6]) + 1.0
    losses = head.loss(
        preds,
        jnp.array(boxes),
        jnp.array(rng.randint(0, 10, (1, g)), jnp.int32),
        jnp.array([4], jnp.int32),
    )
    for key, v in losses.items():
        assert np.isfinite(float(v)), key
    assert float(losses["total"]) > 0

    dec = head.get_bboxes(preds, max_num=20)
    assert dec["bboxes"].shape == (1, 20, 9)
    assert np.isfinite(np.asarray(dec["bboxes"])).all()


def test_bev_head_loss_grad():
    cfg = mini_config()
    head = bev_head.BEVHead(cfg=cfg)
    rng = np.random.RandomState(1)
    bev = jnp.array(rng.randn(1, cfg.bev_h * cfg.bev_w, cfg.embed_dims) * 0.1,
                    jnp.float32)
    params = head.init(jax.random.PRNGKey(0), bev)
    boxes = rng.randn(1, 4, 9).astype(np.float32)
    boxes[..., 3:6] = np.abs(boxes[..., 3:6]) + 1.0
    gtb = jnp.array(boxes)
    gtl = jnp.array(rng.randint(0, 10, (1, 4)), jnp.int32)
    ng = jnp.array([3], jnp.int32)

    def f(p):
        preds = head.apply(p, bev)
        return head.loss(preds, gtb, gtl, ng)["total"]

    g = jax.grad(f)(params)
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0
