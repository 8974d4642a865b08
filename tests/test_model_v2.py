"""BEVFormerV2 forward smoke tests (CPU, mini shapes, no DD3D)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bevformer_tpu.configs import BEVFormerConfig, DataConfig, get_config

# compile-heavy (full model / Pallas kernel graphs): slow tier
pytestmark = pytest.mark.slow


def mini_v2_config(**kw):
    base = dict(
        name="mini_v2",
        version="v2",
        backbone_depth=10,
        backbone_out_indices=(1, 2, 3),
        backbone_dcn_stages=(),
        backbone_style="caffe",
        backbone_norm="bn",
        neck_in_channels=(128, 256, 512),
        num_feature_levels=3,
        num_mono_levels=0,
        bev_h=8,
        bev_w=8,
        encoder_layers=1,
        decoder_layers=2,
        num_query=12,
        group_detr=3,
        frames=(-1, 0),
        bbox_loss="smooth_l1",
        bbox_loss_weight=0.75,
        use_grid_mask=False,
        video_test_mode=False,
        data=DataConfig(raw_size=(64, 128), scale=1.0, queue_length=1),
    )
    base.update(kw)
    return BEVFormerConfig(**base)


@pytest.fixture(scope="module")
def v2_setup():
    from bevformer_tpu.models.detector_v2 import BEVFormerV2

    cfg = mini_v2_config()
    model = BEVFormerV2(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    bs, cams = 1, 6
    h, w = cfg.data.img_size
    images = jnp.zeros((bs, cams, h, w, 3), jnp.float32)
    lidar2img = jnp.broadcast_to(jnp.eye(4), (bs, cams, 4, 4))
    variables = model.init(
        {"params": rng, "dropout": rng, "grid_mask": rng},
        images,
        lidar2img,
    )
    return cfg, model, variables, (images, lidar2img)


def test_v2_eval_forward(v2_setup):
    cfg, model, variables, (images, lidar2img) = v2_setup
    out = model.apply(variables, images, lidar2img)
    # eval: only the first group of queries
    assert out["all_cls_scores"].shape == (
        cfg.decoder_layers, 1, cfg.num_query, cfg.num_classes,
    )
    assert np.isfinite(np.asarray(out["all_cls_scores"])).all()


def test_v2_train_forward_groups_and_bn(v2_setup):
    cfg, model, variables, (images, lidar2img) = v2_setup
    rngs = {"dropout": jax.random.PRNGKey(1), "grid_mask": jax.random.PRNGKey(2)}
    out, updates = model.apply(
        variables,
        images,
        lidar2img,
        training=True,
        rngs=rngs,
        mutable=["batch_stats"],
    )
    # training exposes all groups
    assert out["all_cls_scores"].shape[2] == cfg.num_query * cfg.group_detr
    # batch stats were updated (trainable SyncBN semantics)
    assert "batch_stats" in updates
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    diffs = [float(jnp.abs(a - b).max()) for a, b in zip(before, after)]
    assert max(diffs) > 0


def test_v2_multiframe_fusion(v2_setup):
    cfg, model, variables, (images, lidar2img) = v2_setup
    bs = 1
    bev = jnp.ones((bs, cfg.bev_h * cfg.bev_w, cfg.embed_dims), jnp.float32)
    out0 = model.apply(variables, images, lidar2img, prev_bev_list=[None, None])
    out1 = model.apply(variables, images, lidar2img, prev_bev_list=[bev, None])
    d = np.abs(
        np.asarray(out0["all_cls_scores"]) - np.asarray(out1["all_cls_scores"])
    ).max()
    assert d > 1e-6  # history frame actually feeds the fusion


def test_v2_bev_only_and_feature_flip(v2_setup):
    cfg, model, variables, (images, lidar2img) = v2_setup
    rng = np.random.RandomState(0)
    imgs = jnp.array(rng.randn(*images.shape), jnp.float32)
    bev = model.apply(variables, imgs, lidar2img, method="bev_only")
    assert bev.shape == (1, cfg.bev_h * cfg.bev_w, cfg.embed_dims)
    # flip flag changes features
    bev_f = model.apply(
        variables, imgs, lidar2img, jnp.ones((1,), bool),
        method="bev_only",
    )
    assert np.abs(np.asarray(bev) - np.asarray(bev_f)).max() > 1e-6


def test_v2_loss_with_groups():
    from bevformer_tpu.core.losses import bevformer_loss
    from bevformer_tpu.core.boxes import DEFAULT_CODE_WEIGHTS

    rng = np.random.RandomState(0)
    L, b, nq, groups = 2, 1, 10, 3
    preds = {
        "all_cls_scores": jnp.array(rng.randn(L, b, nq * groups, 10), jnp.float32),
        "all_bbox_preds": jnp.array(rng.randn(L, b, nq * groups, 10), jnp.float32),
    }
    boxes = np.abs(rng.randn(b, 5, 9)).astype(np.float32) + 0.3
    out = bevformer_loss(
        preds,
        jnp.array(boxes),
        jnp.array(rng.randint(0, 10, (b, 5)), jnp.int32),
        jnp.array([4], jnp.int32),
        DEFAULT_CODE_WEIGHTS,
        group_detr=groups,
        num_query=nq,
        bbox_loss="smooth_l1",
        bbox_loss_weight=0.75,
    )
    for k, v in out.items():
        assert np.isfinite(float(v)), k


def test_v2_configs_registered():
    for name in ("bevformerv2-r50-t1", "bevformerv2-r50-t2",
                 "bevformerv2-r50-t8", "bevformerv2-r50-t1-base"):
        cfg = get_config(name)
        assert cfg.version == "v2"
    assert get_config("bevformerv2-r50-t2").frames == (-1, 0)
    assert len(get_config("bevformerv2-r50-t8").frames) == 8
    assert get_config("bevformerv2-r50-t1").group_detr == 11
    # t1-base = t1 minus GroupDETR and minus train-time aug
    # (`bevformerv2-r50-t1-base-24ep.py:34-41,64-72,190`)
    base = get_config("bevformerv2-r50-t1-base")
    assert base.group_detr == 1
    assert base.frames == (0,)
    assert base.data.v2_resize_ladder == (640,)
    assert not base.data.v2_rand_flip and not base.data.v2_use_grst
