"""Model forward smoke tests on a miniature config (CPU)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bevformer_tpu.configs import BEVFormerConfig, DataConfig, get_config

# compile-heavy (full model / Pallas kernel graphs): slow tier
pytestmark = pytest.mark.slow


def mini_config(**kw):
    base = dict(
        name="mini",
        backbone_depth=10,
        backbone_out_indices=(3,),
        backbone_dcn_stages=(),
        backbone_style="pytorch",
        neck_in_channels=(2048,),
        num_feature_levels=1,
        bev_h=8,
        bev_w=8,
        encoder_layers=1,
        decoder_layers=2,
        num_query=12,
        use_grid_mask=False,
        data=DataConfig(raw_size=(64, 128), scale=1.0, queue_length=2),
    )
    base.update(kw)
    return BEVFormerConfig(**base)


@pytest.fixture(scope="module")
def model_and_params():
    from bevformer_tpu.models import BEVFormer

    cfg = mini_config()
    model = BEVFormer(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    bs, cams = 1, 6
    h, w = cfg.data.img_size
    images = jnp.zeros((bs, cams, h, w, 3), jnp.float32)
    can_bus = jnp.zeros((bs, 18), jnp.float32)
    lidar2img = jnp.broadcast_to(jnp.eye(4), (bs, cams, 4, 4))
    prev_bev = jnp.zeros((bs, cfg.bev_h * cfg.bev_w, cfg.embed_dims))
    has_prev = jnp.zeros((bs,), bool)
    params = model.init(
        rng, images, can_bus, lidar2img, prev_bev, has_prev
    )
    return cfg, model, params, (images, can_bus, lidar2img, prev_bev, has_prev)


def test_forward_shapes(model_and_params):
    cfg, model, params, args = model_and_params
    out = model.apply(params, *args)
    assert out["all_cls_scores"].shape == (
        cfg.decoder_layers, 1, cfg.num_query, cfg.num_classes,
    )
    assert out["all_bbox_preds"].shape == (
        cfg.decoder_layers, 1, cfg.num_query, cfg.code_size,
    )
    assert out["bev_embed"].shape == (1, cfg.bev_h * cfg.bev_w, cfg.embed_dims)
    for k in ("all_cls_scores", "all_bbox_preds", "bev_embed"):
        assert np.isfinite(np.asarray(out[k])).all(), k


def test_only_bev_path(model_and_params):
    cfg, model, params, args = model_and_params
    bev = model.apply(params, *args, only_bev=True)
    assert bev.shape == (1, cfg.bev_h * cfg.bev_w, cfg.embed_dims)


def test_prev_bev_changes_output(model_and_params):
    """With has_prev=True and a distinct prev_bev, outputs must differ from
    the no-history forward (temporal attention actually reads history)."""
    cfg, model, params, args = model_and_params
    images, can_bus, lidar2img, prev_bev, _ = args
    out0 = model.apply(params, images, can_bus, lidar2img, prev_bev,
                       jnp.zeros((1,), bool))
    rng = np.random.RandomState(0)
    pb = jnp.array(rng.randn(*prev_bev.shape), jnp.float32)
    out1 = model.apply(params, images, can_bus, lidar2img, pb,
                       jnp.ones((1,), bool))
    diff = np.abs(
        np.asarray(out0["bev_embed"]) - np.asarray(out1["bev_embed"])
    ).max()
    assert diff > 1e-4


def test_bbox_preds_respect_pc_range(model_and_params):
    cfg, model, params, args = model_and_params
    out = model.apply(params, *args)
    preds = np.asarray(out["all_bbox_preds"])
    assert preds[..., 0].min() >= cfg.pc_range[0]
    assert preds[..., 0].max() <= cfg.pc_range[3]
    assert preds[..., 4].min() >= cfg.pc_range[2]
    assert preds[..., 4].max() <= cfg.pc_range[5]


def test_zoo_configs_registered():
    for name in (
        "bevformer_tiny",
        "bevformer_small",
        "bevformer_base",
        "bevformer_tiny_fp16",
    ):
        cfg = get_config(name)
        assert cfg.name == name
    tiny = get_config("bevformer_tiny")
    assert tiny.data.img_size == (480, 800)
    assert tiny.bev_h == 50 and tiny.encoder_layers == 3
    base = get_config("bevformer_base")
    assert base.data.img_size == (928, 1600)
    assert base.num_feature_levels == 4
    assert base.grid_length == (0.512, 0.512)
    small = get_config("bevformer_small")
    assert small.data.img_size == (736, 1280)


def test_sca_capacity_routing_matches_dense():
    """Static-capacity SCA == dense when capacity covers visible queries."""
    import jax

    from bevformer_tpu.models.attention import SpatialCrossAttention

    rng = np.random.RandomState(0)
    bs, q, e, cams, D = 1, 256, 32, 6, 4
    shapes = ((6, 8),)
    query = jnp.array(rng.randn(bs, q, e), jnp.float32)
    value = jnp.array(rng.randn(bs, cams, 48, e), jnp.float32)
    ref = jnp.array(rng.uniform(0, 1, (bs, cams, q, D, 2)), jnp.float32)
    mask = jnp.array(rng.rand(bs, cams, q, D) < 0.25)

    kw = dict(embed_dims=e, num_cams=cams, num_heads=4, num_levels=1,
              num_points=4, dropout=0.0)
    m_dense = SpatialCrossAttention(capacity_ratio=0.0, **kw)
    m_cap = SpatialCrossAttention(capacity_ratio=0.75, **kw)
    params = m_dense.init(jax.random.PRNGKey(0), query, value, None, ref,
                          mask, shapes)
    out_d = m_dense.apply(params, query, value, None, ref, mask, shapes)
    out_c = m_cap.apply(params, query, value, None, ref, mask, shapes)
    assert float(jnp.abs(out_d - out_c).max()) < 1e-5


def test_dcn_shift_matches_gather():
    """DCNv2 shift-conv sampling == exact bilinear path within the radius."""
    import jax

    from bevformer_tpu.models.resnet import ModulatedDeformConv

    rng = np.random.RandomState(0)
    x = jnp.array(rng.randn(2, 12, 16, 8), jnp.float32)
    for stride in (1, 2):
        m_shift = ModulatedDeformConv(features=16, stride=stride, shift_radius=3)
        m_exact = ModulatedDeformConv(features=16, stride=stride, shift_radius=0)
        params = m_shift.init(jax.random.PRNGKey(0), x)
        bias = rng.uniform(
            -2.5, 2.5, params["params"]["conv_offset"]["bias"].shape
        ).astype(np.float32)
        bias[18:] = rng.randn(9) * 0.5
        params["params"]["conv_offset"]["bias"] = jnp.array(bias)
        a = np.asarray(m_shift.apply(params, x))
        e = np.asarray(m_exact.apply(params, x))
        assert np.abs(a - e).max() < 1e-4
