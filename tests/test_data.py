"""Data layer: synthetic dataset generation, infos reading, queue sampling,
union2one can_bus semantics, preprocessing geometry."""

import os

import numpy as np
import pytest

from bevformer_tpu.configs import get_config
from bevformer_tpu.data import synth
from bevformer_tpu.data.dataset import NuScenesTemporalDataset


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    out = tmp_path_factory.mktemp("nusc_synth")
    synth.generate(
        str(out),
        num_scenes=2,
        frames_per_scene=6,
        num_objects=8,
        img_w=200,
        img_h=112,
        write_images=True,
        seed=0,
    )
    return str(out)


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = get_config("bevformer_tiny")
    return cfg.replace(
        data=cfg.data.replace(raw_size=(112, 200), scale=0.5)
        if hasattr(cfg.data, "replace")
        else cfg.data
    )


def test_generate_files(synth_root):
    assert os.path.exists(
        os.path.join(synth_root, "nuscenes_infos_temporal_train.pkl")
    )
    assert os.path.exists(
        os.path.join(synth_root, "nuscenes_infos_temporal_val.pkl")
    )
    import glob

    imgs = glob.glob(os.path.join(synth_root, "samples", "*.jpg"))
    assert len(imgs) == 2 * 6 * 6  # scenes * frames * cams


def test_train_sample_shapes(synth_root):
    import dataclasses

    cfg = get_config("bevformer_tiny")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, raw_size=(112, 200), scale=0.5,
                                 queue_length=3)
    )
    ds = NuScenesTemporalDataset(
        os.path.join(synth_root, "nuscenes_infos_temporal_train.pkl"),
        cfg,
        data_root=synth_root,
    )
    assert len(ds) == 6
    s = ds.get_train_sample(4)
    assert s is not None
    t = cfg.data.queue_length
    h, w = cfg.data.img_size
    assert s["images"].shape == (t, 6, h, w, 3)
    assert s["can_bus"].shape == (t, 18)
    assert s["lidar2img"].shape == (t, 6, 4, 4)
    assert s["num_gt"] > 0
    assert np.isfinite(s["images"]).all()

    # union2one: first frame of a scene must have zeroed deltas
    first = np.where(~s["prev_exists"])[0]
    for i in first:
        assert np.allclose(s["can_bus"][i][:3], 0)
        assert s["can_bus"][i][-1] == 0
    # continuing frames have nonzero translation delta (ego moves)
    cont = np.where(s["prev_exists"])[0]
    assert len(cont) > 0
    assert np.abs(s["can_bus"][cont][:, :2]).max() > 0.1


def test_gt_projection_consistency(synth_root):
    """A GT box center must project inside some camera image."""
    import dataclasses

    cfg = get_config("bevformer_tiny")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, raw_size=(112, 200), scale=1.0)
    )
    ds = NuScenesTemporalDataset(
        os.path.join(synth_root, "nuscenes_infos_temporal_val.pkl"),
        cfg,
        data_root=synth_root,
        load_images=False,
    )
    rec = ds.frame_record(0)
    ann = ds._annotations(ds.infos[0])
    boxes = ann["gt_boxes"]
    assert len(boxes) > 0
    hits = 0
    for b in boxes:
        p = np.array([b[0], b[1], b[2], 1.0])
        for l2i in rec["lidar2img"]:
            uv = l2i @ p
            if uv[2] > 0.5:
                u, v = uv[0] / uv[2], uv[1] / uv[2]
                if 0 <= u < 200 and 0 <= v < 112:
                    hits += 1
                    break
    assert hits >= len(boxes) * 0.5  # most boxes visible somewhere


def test_preprocess_scaling_updates_lidar2img():
    import dataclasses

    from bevformer_tpu.data.pipeline import preprocess_images

    cfg = get_config("bevformer_tiny").data  # scale 0.5, RGB norms
    cfg = dataclasses.replace(cfg, raw_size=(64, 128))
    imgs = [np.random.RandomState(0).rand(64, 128, 3) * 255 for _ in range(2)]
    l2i = np.stack([np.eye(4)] * 2)
    out, l2i2 = preprocess_images(imgs, l2i, cfg)
    assert out.shape == (2, cfg.img_size[0], cfg.img_size[1], 3)
    assert abs(l2i2[0][0, 0] - 0.5) < 1e-6
    assert abs(l2i2[0][2, 2] - 1.0) < 1e-6
