"""DD3D head: geometry sanity + loss forward on tiny shapes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bevformer_tpu.models import dd3d
from tests.test_model_v2 import mini_v2_config

# compile-heavy (full model / Pallas kernel graphs): slow tier
pytestmark = pytest.mark.slow


def test_quat_matrix_roundtrip():
    rng = np.random.RandomState(0)
    q = rng.randn(20, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    m = dd3d.quat_to_matrix(jnp.array(q))
    q2 = np.asarray(dd3d.matrix_to_quat(m))
    # q and -q are the same rotation
    sign = np.sign((q2 * q).sum(1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-5)


def test_corners_identity_box():
    """Unit box at depth 5 straight ahead with identity intrinsics."""
    quat = jnp.array([[1.0, 0, 0, 0]])
    ctr = jnp.array([[0.0, 0.0]])
    depth = jnp.array([5.0])
    size = jnp.array([[2.0, 4.0, 1.0]])  # w, l, h
    inv_k = jnp.eye(3)[None]
    corners = np.asarray(dd3d.boxes3d_corners(quat, ctr, depth, size, inv_k))[0]
    assert corners.shape == (8, 3)
    center = corners.mean(0)
    np.testing.assert_allclose(center, [0, 0, 5], atol=1e-5)
    # extents: x span = l = 4 (lwh ordering), y span = w = 2, z span = h = 1
    np.testing.assert_allclose(corners[:, 0].max() - corners[:, 0].min(), 4.0, atol=1e-5)
    np.testing.assert_allclose(corners[:, 1].max() - corners[:, 1].min(), 2.0, atol=1e-5)
    np.testing.assert_allclose(corners[:, 2].max() - corners[:, 2].min(), 1.0, atol=1e-5)


def test_allocentric_frontal_is_identity():
    """For a center on the optical axis, allocentric == egocentric."""
    rng = np.random.RandomState(1)
    q = rng.randn(5, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    ctr = jnp.zeros((5, 2))
    inv_k = jnp.broadcast_to(jnp.eye(3), (5, 3, 3))
    out = np.asarray(dd3d.allocentric_to_egocentric(jnp.array(q), ctr, inv_k))
    sign = np.sign((out * q).sum(1, keepdims=True))
    np.testing.assert_allclose(out * sign, q, atol=1e-5)


def _mk_targets(rng, n, g, img_w, img_h):
    boxes = np.zeros((n, g, 4), np.float32)
    x1 = rng.uniform(0, img_w * 0.6, (n, g))
    y1 = rng.uniform(0, img_h * 0.6, (n, g))
    boxes[..., 0], boxes[..., 1] = x1, y1
    boxes[..., 2] = x1 + rng.uniform(20, img_w * 0.4, (n, g))
    boxes[..., 3] = y1 + rng.uniform(20, img_h * 0.4, (n, g))
    quat = rng.randn(n, g, 4).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    return {
        "boxes2d": jnp.array(boxes),
        "classes": jnp.array(rng.randint(0, 10, (n, g)), jnp.int32),
        "num_gt": jnp.array(rng.randint(1, g + 1, (n,)), jnp.int32),
        "img_valid": jnp.ones((n,), bool),
        "box3d_quat": jnp.array(quat),
        "box3d_ctr": jnp.array(
            (boxes[..., :2] + boxes[..., 2:]) / 2, jnp.float32
        ),
        "box3d_depth": jnp.array(rng.uniform(5, 40, (n, g)), jnp.float32),
        "box3d_size": jnp.array(
            np.abs(rng.randn(n, g, 3)) + 1.0, jnp.float32
        ),
        "attributes": jnp.array(rng.randint(0, 4, (n, g)), jnp.int32),
        "speeds": jnp.array(rng.uniform(0, 10, (n, g)), jnp.float32),
    }


def test_dd3d_loss_forward():
    cfg = mini_v2_config(num_mono_levels=0)  # cfg only used for dims
    head = dd3d.NuscenesDD3D(cfg=cfg)
    rng = np.random.RandomState(0)
    n, ch = 2, cfg.embed_dims
    img_h, img_w = 64, 128
    shapes = [(img_h // s, img_w // s) for s in (8, 16, 32, 64, 128)]
    feats = [
        jnp.array(rng.randn(n, h, w, ch) * 0.1, jnp.float32) for h, w in shapes
    ]
    f = 100.0
    inv_k = np.linalg.inv(
        np.array([[f, 0, img_w / 2], [0, f, img_h / 2], [0, 0, 1]])
    )
    inv_k = jnp.array(np.tile(inv_k[None], (n, 1, 1)), jnp.float32)
    targets = _mk_targets(rng, n, 8, img_w, img_h)

    variables = head.init(
        jax.random.PRNGKey(0), feats, inv_k, targets, train=False
    )
    losses = head.apply(variables, feats, inv_k, targets, train=False)
    expected = {
        "loss_cls", "loss_box2d_reg", "loss_centerness", "loss_conf3d",
        "loss_attr", "loss_speed", "loss_box3d_quat", "loss_box3d_proj_ctr",
        "loss_box3d_depth", "loss_box3d_size",
    }
    assert set(losses) == expected
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    # there must be positives (boxes cover the image)
    assert float(losses["loss_box2d_reg"]) > 0


def test_dd3d_grad_flows():
    cfg = mini_v2_config(num_mono_levels=0)
    head = dd3d.NuscenesDD3D(cfg=cfg)
    rng = np.random.RandomState(1)
    n, ch = 1, cfg.embed_dims
    img_h, img_w = 32, 64
    shapes = [(img_h // s, img_w // s) for s in (8, 16, 32, 64, 128)]
    shapes = [(max(h, 1), max(w, 1)) for h, w in shapes]
    feats = [
        jnp.array(rng.randn(n, h, w, ch) * 0.1, jnp.float32) for h, w in shapes
    ]
    inv_k = jnp.broadcast_to(jnp.eye(3) * 0.01, (n, 3, 3)).astype(jnp.float32)
    targets = _mk_targets(rng, n, 4, img_w, img_h)
    variables = head.init(jax.random.PRNGKey(0), feats, inv_k, targets, train=False)

    def loss_fn(params):
        out = head.apply(
            {**variables, "params": params}, feats, inv_k, targets, train=False
        )
        return sum(out.values())

    g = jax.grad(loss_fn)(variables["params"])
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0
