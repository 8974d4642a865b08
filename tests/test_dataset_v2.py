"""V2 dataset: frames queue, shared aug, mono targets, bda geometry."""

import dataclasses
import os

import numpy as np
import pytest

from bevformer_tpu.configs import get_config
from bevformer_tpu.data import synth
from bevformer_tpu.data.dataset_v2 import NuScenesTemporalDatasetV2

# compile-heavy (full model / Pallas kernel graphs): slow tier
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    out = tmp_path_factory.mktemp("nusc_synth_v2")
    synth.generate(
        str(out), num_scenes=2, frames_per_scene=5, num_objects=10,
        img_w=200, img_h=112, seed=1,
    )
    return str(out)


def _cfg():
    cfg = get_config("bevformerv2-r50-t2")  # frames (-1, 0)
    return cfg.replace(
        data=dataclasses.replace(
            cfg.data, raw_size=(112, 200), queue_length=1
        ),
        max_gt=32,
    )


def test_v2_train_sample(synth_root):
    cfg = _cfg()
    ds = NuScenesTemporalDatasetV2(
        os.path.join(synth_root, "nuscenes_infos_temporal_train.pkl"),
        cfg,
        data_root=synth_root,
        max_mono_boxes=16,
    )
    # crop is nuScenes-specific (0,260,1600,900); synth images are small, so
    # patch the aug for a full-frame crop
    orig = ds._aug_params

    def patched(train):
        a = orig(train)
        a["ida"] = dict(
            resize=1.0, resize_dims=(200, 112), crop=(0, 0, 200, 112),
            flip=bool(a["ida"]["flip"]),
        )
        return a

    ds._aug_params = patched

    s = ds.get_train_sample_v2(2)
    assert s is not None
    t = len(cfg.frames)
    assert s["images"].shape[0] == t
    assert s["frame_valid"].all()
    assert s["num_gt"] > 0
    assert np.isfinite(s["images"]).all()
    assert s["bda_mat"].shape == (2, 2)
    # mono: some camera must see at least one box
    assert s["mono_num_gt"].sum() > 0
    assert np.isfinite(s["inv_intrinsics"]).all()
    # projected centers must be inside the image
    for ci in range(6):
        n = s["mono_num_gt"][ci]
        if n:
            ctr = s["mono_ctr"][ci, :n]
            assert (ctr[:, 0] >= 0).all() and (ctr[:, 0] <= 200).all()
            assert (s["mono_depth"][ci, :n] > 0).all()


def test_v2_history_frame_geometry(synth_root):
    """Adjacent-frame lidar2img must map current-frame points plausibly."""
    cfg = _cfg()
    ds = NuScenesTemporalDatasetV2(
        os.path.join(synth_root, "nuscenes_infos_temporal_val.pkl"),
        cfg,
        data_root=synth_root,
        load_images=False,
    )
    orig = ds._aug_params

    def patched(train):
        a = orig(train)
        a["ida"] = dict(
            resize=1.0, resize_dims=(200, 112), crop=(0, 0, 200, 112),
            flip=False,
        )
        return a

    ds._aug_params = patched
    s = ds.get_test_sample_v2(2)
    cur_i = list(cfg.frames).index(0)
    other = 1 - cur_i
    assert s["frame_valid"][other]
    # the composed matrices differ from the current frame's (ego moved)
    d = np.abs(s["lidar2img"][other] - s["lidar2img"][cur_i]).max()
    assert d > 1e-3
