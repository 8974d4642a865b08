"""Checkpoint conversion round-trip + structural match with model.init."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_model import mini_config


def _init_params(cfg):
    from bevformer_tpu.models import BEVFormer

    model = BEVFormer(cfg=cfg)
    bs, cams = 1, 6
    h, w = cfg.data.img_size
    images = jnp.zeros((bs, cams, h, w, 3), jnp.float32)
    can_bus = jnp.zeros((bs, 18), jnp.float32)
    l2i = jnp.broadcast_to(jnp.eye(4), (bs, cams, 4, 4))
    prev = jnp.zeros((bs, cfg.bev_h * cfg.bev_w, cfg.embed_dims))
    has = jnp.zeros((bs,), bool)
    return model, jax.eval_shape(
        lambda: BEVFormer(cfg=cfg).init(
            jax.random.PRNGKey(0), images, can_bus, l2i, prev, has
        )
    )


def _concretize(tree, seed=0):
    leaves, treedef = jax.tree.flatten(tree)
    rng = np.random.RandomState(seed)
    out = [
        jnp.asarray(np.asarray(rng.randn(*l.shape), np.float32))
        for l in leaves
    ]
    return jax.tree.unflatten(treedef, out)


def _flat_shapes(tree):
    return {
        "/".join(str(getattr(k, "key", k)) for k in path): v.shape
        for path, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def test_roundtrip_and_structure():
    from bevformer_tpu.runtime.checkpoint import (
        convert_reference_state_dict,
        export_reference_state_dict,
    )

    cfg = mini_config()
    model, shapes = _init_params(cfg)
    params = _concretize(shapes)

    sd = export_reference_state_dict(params, cfg)
    # spot-check the reference key naming (verified against
    # fundamentalvision/BEVFormer checkpoints' state_dict layout)
    for key in (
        "img_backbone.conv1.weight",
        "img_backbone.layer1.0.downsample.0.weight",
        "img_backbone.bn1.running_mean",
        "img_neck.lateral_convs.0.conv.weight",
        "pts_bbox_head.bev_embedding.weight",
        "pts_bbox_head.query_embedding.weight",
        "pts_bbox_head.cls_branches.0.6.bias",
        "pts_bbox_head.reg_branches.1.4.weight",
        "pts_bbox_head.transformer.level_embeds",
        "pts_bbox_head.transformer.can_bus_mlp.norm.weight",
        "pts_bbox_head.transformer.encoder.layers.0.attentions.0.sampling_offsets.weight",
        "pts_bbox_head.transformer.encoder.layers.0.attentions.1.deformable_attention.value_proj.weight",
        "pts_bbox_head.transformer.decoder.layers.0.attentions.0.attn.in_proj_weight",
        "pts_bbox_head.transformer.decoder.layers.1.attentions.1.output_proj.bias",
        "pts_bbox_head.transformer.decoder.layers.0.ffns.0.layers.0.0.weight",
    ):
        assert key in sd, key

    back = convert_reference_state_dict(sd, cfg)
    got = _flat_shapes(back)
    want = _flat_shapes(params["params"])
    missing = set(want) - set(got)
    extra = set(got) - set(want)
    assert not missing, f"converter missing {sorted(missing)[:10]}"
    assert not extra, f"converter extra {sorted(extra)[:10]}"
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])
    # values round-trip exactly
    for path, v in jax.tree_util.tree_flatten_with_path(params["params"])[0]:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        node = back
        for part in key.split("/"):
            node = node[part]
        np.testing.assert_array_equal(np.asarray(node), np.asarray(v)), key


def test_roundtrip_with_dcn():
    from bevformer_tpu.runtime.checkpoint import (
        convert_reference_state_dict,
        export_reference_state_dict,
    )

    cfg = mini_config(backbone_dcn_stages=(2, 3), backbone_style="caffe")
    model, shapes = _init_params(cfg)
    params = _concretize(shapes)
    sd = export_reference_state_dict(params, cfg)
    assert "img_backbone.layer3.0.conv2.conv_offset.weight" in sd
    back = convert_reference_state_dict(sd, cfg)
    assert _flat_shapes(back) == _flat_shapes(params["params"])


def test_roundtrip_r50_stacked_blocks():
    """Depth-50 stages have scanned tail blocks (stacked params)."""
    from bevformer_tpu.runtime.checkpoint import (
        convert_reference_state_dict,
        export_reference_state_dict,
    )

    cfg = mini_config(backbone_depth=50)
    model, shapes = _init_params(cfg)
    params = _concretize(shapes)
    sd = export_reference_state_dict(params, cfg)
    # torch keys for every block of layer3 (6 blocks in R50)
    for blk in range(6):
        assert f"img_backbone.layer3.{blk}.conv2.weight" in sd
    back = convert_reference_state_dict(sd, cfg)
    assert _flat_shapes(back) == _flat_shapes(params["params"])
    # spot value check through the stack/unstack
    import numpy as np

    a = np.asarray(
        params["params"]["img_backbone"]["layer3_rest"]["block"]["conv1"]["kernel"]
    )
    b = np.asarray(back["img_backbone"]["layer3_rest"]["block"]["conv1"]["kernel"])
    np.testing.assert_array_equal(a, b)


def test_converter_strict_key_accounting():
    """Every reference tensor must be consumed; leftovers and missing keys
    must fail loudly (VERDICT r1: a silent mis-map decodes garbage)."""
    import pytest
    from bevformer_tpu.runtime.checkpoint import (
        convert_reference_state_dict,
        export_reference_state_dict,
    )

    cfg = mini_config()
    _, shapes = _init_params(cfg)
    params = _concretize(shapes)
    sd = export_reference_state_dict(params, cfg)

    # clean: consumes everything
    convert_reference_state_dict(dict(sd), cfg)

    # alien key -> strict error, opt-out works
    sd_extra = dict(sd)
    sd_extra["pts_bbox_head.unmapped.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError, match="not consumed"):
        convert_reference_state_dict(sd_extra, cfg)
    convert_reference_state_dict(sd_extra, cfg, strict=False)

    # missing key -> KeyError
    sd_missing = dict(sd)
    del sd_missing["pts_bbox_head.query_embedding.weight"]
    with pytest.raises(KeyError):
        convert_reference_state_dict(sd_missing, cfg)


def test_converter_transpose_directions():
    """One asymmetric fixture per parameter class: conv kernels, dense
    kernels, LN/BN vectors, embeddings must land transposed correctly (a
    silent wrong transpose is shape-compatible for square layers, so use
    rectangular values and check exact elements)."""
    from bevformer_tpu.runtime.checkpoint import (
        convert_reference_state_dict,
        export_reference_state_dict,
    )

    cfg = mini_config()
    _, shapes = _init_params(cfg)
    params = _concretize(shapes)
    sd = export_reference_state_dict(params, cfg)
    back = convert_reference_state_dict(dict(sd), cfg)
    p = params["params"]

    # conv: flax [kh, kw, I, O] <-> torch [O, I, kh, kw]
    ours = np.asarray(p["img_backbone"]["stem_conv"]["kernel"])
    theirs = sd["img_backbone.conv1.weight"]
    assert ours.shape[-1] == theirs.shape[0]
    np.testing.assert_array_equal(theirs, np.transpose(ours, (3, 2, 0, 1)))
    np.testing.assert_array_equal(
        np.asarray(back["img_backbone"]["stem_conv"]["kernel"]), ours
    )

    # dense: flax [I, O] <-> torch [O, I]
    ours = np.asarray(
        p["pts_bbox_head"]["transformer"]["reference_points"]["kernel"]
    )
    theirs = sd["pts_bbox_head.transformer.reference_points.weight"]
    np.testing.assert_array_equal(theirs, ours.T)

    # BN vectors: straight copies
    np.testing.assert_array_equal(
        sd["img_backbone.bn1.running_var"],
        np.asarray(p["img_backbone"]["stem_bn"]["var"]),
    )

    # embeddings: straight copies
    np.testing.assert_array_equal(
        sd["pts_bbox_head.bev_embedding.weight"],
        np.asarray(p["pts_bbox_head"]["bev_embedding"]),
    )

    # full round trip: every leaf identical
    flat_a = _flat_shapes(params["params"])
    flat_b = _flat_shapes(back)
    assert flat_a == flat_b
    for (pa, va), (pb, vb) in zip(
        jax.tree_util.tree_flatten_with_path(params["params"])[0],
        jax.tree_util.tree_flatten_with_path(back)[0],
    ):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb), err_msg=str(pa))


def test_load_pth_notorch_matches_torch(tmp_path):
    """The pure zip/pickle reader must agree with torch.load, including
    non-contiguous tensors, scalars, fp16 and bf16 storages."""
    import torch
    from bevformer_tpu.runtime.checkpoint import load_pth, load_pth_notorch

    sd = {
        "a.weight": torch.arange(24, dtype=torch.float32).reshape(2, 3, 4),
        "a.bias": torch.randn(7),
        "b.weight": torch.randn(5, 6).t(),  # non-contiguous
        "c.half": torch.randn(3, 3).half(),
        "c.bf16": torch.randn(4, 2).bfloat16(),
        "d.long": torch.arange(5),
        "e.scalar": torch.tensor(3.5),
    }
    path = str(tmp_path / "ckpt.pth")
    torch.save({"state_dict": sd, "meta": {"epoch": 3}}, path)

    ours = load_pth_notorch(path)
    ref = load_pth(path)
    assert set(ours) == set(ref) == set(sd)
    for k in sd:
        a, b = ours[k], ref[k]
        if sd[k].dtype == torch.bfloat16:
            b = sd[k].float().numpy()  # our reader upcasts bf16 -> f32
        assert a.shape == np.asarray(b).shape, k
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64), err_msg=k
        )


def _init_v2_variables(cfg):
    """eval_shape of the FULL V2 variable tree (incl. mono head + BN
    batch_stats)."""
    import numpy as np
    from bevformer_tpu.models.detector_v2 import BEVFormerV2
    from tests.test_dd3d import _mk_targets

    model = BEVFormerV2(cfg=cfg)
    h, w = cfg.data.img_size
    images = jnp.zeros((1, 6, h, w, 3), jnp.float32)
    l2i = jnp.broadcast_to(jnp.eye(4), (1, 6, 4, 4))
    use_mono = cfg.num_mono_levels > 0
    if use_mono:
        tgts = _mk_targets(np.random.RandomState(0), 6, 4, w, h)
        ik = jnp.broadcast_to(jnp.eye(3), (1, 6, 3, 3)).astype(jnp.float32)

    def fwd(mdl):
        out, mono = mdl(images, l2i, return_mono_feats=True)
        if use_mono:
            mdl.mono_losses(mono, ik, tgts, training=False)
        return out

    return model, jax.eval_shape(
        lambda: BEVFormerV2(cfg=cfg).init(
            {"params": jax.random.PRNGKey(0)}, method=fwd
        )
    )


def test_roundtrip_v2():
    """V2 converter round-trip: fusion (frames>1), GroupDETR queries, BN
    running stats, DD3D mono head (detectron2 'v2' tower layout)."""
    from tests.test_model_v2 import mini_v2_config
    from bevformer_tpu.runtime.checkpoint import (
        convert_reference_state_dict_v2,
        export_reference_state_dict_v2,
    )

    cfg = mini_v2_config(num_mono_levels=5)
    model, shapes = _init_v2_variables(cfg)
    variables = _concretize(shapes)

    sd = export_reference_state_dict_v2(variables, cfg)
    for key in (
        "img_backbone.bn1.running_mean",
        "pts_bbox_head.query_embedding.weight",  # num_query*group rows
        "pts_bbox_head.transformer.fusion.layers.0.conv1.weight",
        "pts_bbox_head.transformer.fusion.layer_norm.0.weight",
        "pts_bbox_head.transformer.reference_points.weight",
        "pts_bbox_head.transformer.decoder.layers.0.attentions.0.attn.in_proj_weight",
        "fcos3d_bbox_head.fcos2d_head.cls_tower.0.weight",
        "fcos3d_bbox_head.fcos2d_head.cls_tower.0.norm.2.running_var",
        "fcos3d_bbox_head.fcos2d_head.scales_box2d_reg.0.scale",
        "fcos3d_bbox_head.fcos3d_head.box3d_depth.0.weight",
        "fcos3d_bbox_head.fcos3d_head.offsets_depth.3.bias",
        "fcos3d_bbox_head.attr_logits.weight",
        "fcos3d_bbox_head.speed.bias",
    ):
        assert key in sd, key
    # V2 has no CAN-bus MLP
    assert "pts_bbox_head.transformer.can_bus_mlp.0.weight" not in sd
    # box3d_depth carries no bias in the reference (use_scale)
    assert "fcos3d_bbox_head.fcos3d_head.box3d_depth.0.bias" not in sd
    assert (
        sd["pts_bbox_head.query_embedding.weight"].shape[0]
        == cfg.num_query * cfg.group_detr
    )

    back = convert_reference_state_dict_v2(sd, cfg)
    got_p = _flat_shapes(back["params"])
    want_p = _flat_shapes(variables["params"])
    assert set(got_p) == set(want_p), (
        sorted(set(want_p) - set(got_p))[:10],
        sorted(set(got_p) - set(want_p))[:10],
    )
    got_s = _flat_shapes(back["batch_stats"])
    want_s = _flat_shapes(variables["batch_stats"])
    assert set(got_s) == set(want_s), (
        sorted(set(want_s) - set(got_s))[:10],
        sorted(set(got_s) - set(want_s))[:10],
    )
    # exact value round-trip everywhere except the depth bias (dropped on
    # export because the reference has none)
    for coll in ("params", "batch_stats"):
        for path, v in jax.tree_util.tree_flatten_with_path(
            variables[coll]
        )[0]:
            key = "/".join(str(getattr(k, "key", k)) for k in path)
            if key == "fcos3d_bbox_head/box3d_depth/bias":
                continue
            node = back[coll]
            for part in key.split("/"):
                node = node[part]
            np.testing.assert_array_equal(
                np.asarray(node), np.asarray(v), err_msg=key
            )


def test_roundtrip_v2_r50_single_frame():
    """Depth-50 scanned tails + frames=(0,) (no fusion) + no mono head."""
    from tests.test_model_v2 import mini_v2_config
    from bevformer_tpu.runtime.checkpoint import (
        convert_reference_state_dict_v2,
        export_reference_state_dict_v2,
    )

    cfg = mini_v2_config(backbone_depth=50, frames=(0,), num_mono_levels=0)
    model, shapes = _init_v2_variables(cfg)
    variables = _concretize(shapes)
    sd = export_reference_state_dict_v2(variables, cfg)
    for blk in range(6):
        assert f"img_backbone.layer3.{blk}.bn2.running_var" in sd
    assert "pts_bbox_head.transformer.fusion.layers.0.conv1.weight" not in sd
    back = convert_reference_state_dict_v2(sd, cfg)
    assert _flat_shapes(back["params"]) == _flat_shapes(variables["params"])
    assert _flat_shapes(back["batch_stats"]) == _flat_shapes(
        variables["batch_stats"]
    )
