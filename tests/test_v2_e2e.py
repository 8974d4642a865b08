"""V2 end-to-end loop: synthetic train step -> checkpoint -> restore ->
`tools/test.py`-style eval (VideoEvaluatorV2) -> NDS number.

Round-4 verdict gap: v2 configs trained but could never produce a metric
(`detectors/bevformerV2.py:226-266` was unreachable). This pins the whole
plumbing at toy scale.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bevformer_tpu.data import synth
from bevformer_tpu.data.dataset_v2 import NuScenesTemporalDatasetV2
from tests.test_model_v2 import mini_v2_config

# compile-heavy (full model graphs): slow tier
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    out = tmp_path_factory.mktemp("nusc_synth_v2e2e")
    synth.generate(
        str(out), num_scenes=2, frames_per_scene=4, num_objects=8,
        img_w=128, img_h=64, seed=3,
    )
    return str(out)


def _patch_fullframe(ds, w, h):
    orig = ds._aug_params

    def patched(train):
        a = orig(train)
        a["ida"] = dict(
            resize=1.0, resize_dims=(w, h), crop=(0, 0, w, h), flip=False,
        )
        return a

    ds._aug_params = patched
    return ds


def test_v2_train_ckpt_eval_loop(synth_root, tmp_path):
    from bevformer_tpu.core.boxes import CLASS_NAMES
    from bevformer_tpu.core.evaluation import evaluate_detections
    from bevformer_tpu.runtime import checkpoint as ckpt_lib
    from bevformer_tpu.runtime import optim
    from bevformer_tpu.runtime.eval import VideoEvaluatorV2
    from bevformer_tpu.runtime.train_v2 import (
        BatchV2,
        TrainStateV2,
        init_state_v2,
        make_train_step_v2,
    )
    from bevformer_tpu.models.detector_v2 import BEVFormerV2

    cfg = mini_v2_config()  # frames (-1, 0): exercises fusion + history
    model = BEVFormerV2(cfg=cfg)
    h, w = cfg.data.img_size

    ds = _patch_fullframe(
        NuScenesTemporalDatasetV2(
            os.path.join(synth_root, "nuscenes_infos_temporal_train.pkl"),
            cfg,
            data_root=synth_root,
        ),
        w, h,
    )
    s = None
    for i in range(len(ds)):
        s = ds.get_train_sample_v2(i)
        if s is not None:
            break
    assert s is not None

    def as_batch(s):
        return BatchV2(
            images=jnp.asarray(s["images"], jnp.float32)[None],
            lidar2img=jnp.asarray(s["lidar2img"], jnp.float32)[None],
            frame_valid=jnp.asarray(s["frame_valid"])[None],
            flip=jnp.asarray([bool(s["flip"])]),
            bda_mat=jnp.asarray(s["bda_mat"], jnp.float32)[None],
            gt_boxes=jnp.asarray(s["gt_boxes"], jnp.float32)[None],
            gt_labels=jnp.asarray(s["gt_labels"], jnp.int32)[None],
            num_gt=jnp.asarray([s["num_gt"]], jnp.int32),
        )

    batch = as_batch(s)
    rng = jax.random.PRNGKey(0)

    class _Tx:
        def init(self, params):
            return ()

        def update(self, grads, state, params=None):
            return grads, state

    state = init_state_v2(model, _Tx(), rng, batch)
    tx, _ = optim.make_optimizer(cfg.optim, state.params, 10)
    state = TrainStateV2(
        state.step, state.params, state.batch_stats, tx.init(state.params)
    )
    step_fn = make_train_step_v2(model, tx)
    state, metrics = step_fn(state, batch, rng)
    assert np.isfinite(float(metrics["total"]))

    # checkpoint round trip (batch_stats included)
    ckpt_dir = str(tmp_path / "ckpts")
    ckpt_lib.save_checkpoint(ckpt_dir, state, 1)
    state0 = init_state_v2(model, _Tx(), rng, batch)
    state0 = TrainStateV2(
        state0.step, state0.params, state0.batch_stats,
        tx.init(state0.params),
    )
    restored = ckpt_lib.restore_checkpoint_v2(ckpt_dir, state0)
    assert int(restored.step) == 1
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(restored.params)
    assert max(float(jnp.abs(x - y).max()) for x, y in zip(a, b)) == 0.0
    sa = jax.tree.leaves(state.batch_stats)
    sb = jax.tree.leaves(restored.batch_stats)
    assert max(float(jnp.abs(x - y).max()) for x, y in zip(sa, sb)) == 0.0

    # eval loop (tools/test.py v2 flow)
    val = _patch_fullframe(
        NuScenesTemporalDatasetV2(
            os.path.join(synth_root, "nuscenes_infos_temporal_val.pkl"),
            cfg,
            test_mode=True,
            data_root=synth_root,
        ),
        w, h,
    )
    variables = {
        "params": restored.params, "batch_stats": restored.batch_stats,
    }
    evaluator = VideoEvaluatorV2(model, variables)
    results = evaluator.run(val, indices=range(min(2, len(val))))
    assert len(results) == 2
    for r in results:
        assert np.isfinite(np.asarray(r["boxes_3d"], np.float32)).all()

    gt = {}
    for i in range(2):
        ann = val._annotations(val.infos[i])
        boxes = ann["gt_boxes"].copy()
        if len(boxes):
            boxes[:, 2] -= 0.5 * boxes[:, 5]
        gt[val.infos[i]["token"]] = dict(
            boxes=boxes, labels=ann["gt_labels"], attrs=ann.get("gt_attrs")
        )
    m = evaluate_detections(results, gt, class_names=CLASS_NAMES)
    assert np.isfinite(m["nd_score"])
