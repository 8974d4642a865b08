"""MM_BEVFormerLayer (camera+lidar fusion) and RelPositionEmbedding."""

import jax
import jax.numpy as jnp
import numpy as np

from bevformer_tpu.models.mm_layer import MMBEVFormerLayer
from bevformer_tpu.models.position_embedding import RelPositionEmbedding


def test_rel_position_embedding_shape_and_norm():
    m = RelPositionEmbedding(num_pos_feats=32)
    pos, _ = jax.jit(
        lambda: m.init_with_output(jax.random.PRNGKey(0), 6, 5)
    )()
    assert pos.shape == (30, 32)
    # LayerNorm'd rows: zero mean, unit variance
    np.testing.assert_allclose(np.asarray(pos.mean(-1)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pos.var(-1)), 1.0, atol=1e-3)
    # row/col structure: cells sharing a row share the y half of the input
    m2 = RelPositionEmbedding(num_pos_feats=32, pos_norm=False)
    pos2, _ = m2.init_with_output(jax.random.PRNGKey(0), 6, 5)
    assert pos2.shape == (30, 32)


def test_mm_layer_blends_camera_and_lidar():
    bs, q, e, cams, k = 1, 16, 32, 2, 24
    bev_h = bev_w = 4
    rng = np.random.RandomState(0)
    layer = MMBEVFormerLayer(
        embed_dims=e, num_heads=4, feedforward_channels=64,
        num_cams=cams, num_levels=1, sca_num_points=4, tsa_num_points=2,
        lidar_num_points=2,
    )
    query = jnp.array(rng.randn(bs, q, e), jnp.float32)
    value = jnp.array(rng.randn(bs, cams, k, e), jnp.float32)
    lidar = jnp.array(rng.randn(bs, bev_h * bev_w, e), jnp.float32)
    bev_pos = jnp.array(rng.randn(bs, q, e), jnp.float32)
    vq = jnp.array(rng.randn(bs, 2, q, e), jnp.float32)
    ref2d = jnp.array(rng.rand(bs, 2, q, 1, 2), jnp.float32)
    ref_cam = jnp.array(rng.rand(bs, cams, q, 4, 2), jnp.float32)
    bev_mask = jnp.ones((bs, cams, q, 4), bool)
    args = (query, value, lidar, bev_pos, vq, ref2d, ref_cam, bev_mask,
            ((6, 4),), bev_h, bev_w)
    params = layer.init(jax.random.PRNGKey(0), *args)
    out = layer.apply(params, *args)
    assert out.shape == (bs, q, e)
    assert np.isfinite(np.asarray(out)).all()
    # the learned blend weight exists and gates the lidar branch: forcing
    # w=1 must reproduce a lidar-independent output
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = ["/".join(str(p) for p in path) for path, _ in flat]
    assert any("cross_model_weights" in n for n in names)
    p1 = jax.tree_util.tree_map(lambda x: x, params)
    p1["params"]["cross_model_weights"] = jnp.array(1.0)
    out_a = layer.apply(p1, *args)
    lidar2 = jnp.array(rng.randn(bs, bev_h * bev_w, e), jnp.float32)
    args2 = (query, value, lidar2, bev_pos, vq, ref2d, ref_cam, bev_mask,
             ((6, 4),), bev_h, bev_w)
    out_b = layer.apply(p1, *args2)
    np.testing.assert_allclose(
        np.asarray(out_a), np.asarray(out_b), atol=1e-5
    )
