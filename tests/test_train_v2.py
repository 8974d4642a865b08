"""V2 train step: frames history + BN stats + mono losses, one step."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_dd3d import _mk_targets
from tests.test_model_v2 import mini_v2_config
import pytest

# compile-heavy (full model / Pallas kernel graphs): slow tier
pytestmark = pytest.mark.slow


def make_batch_v2(cfg, bs=1, with_mono=False):
    from bevformer_tpu.runtime.train_v2 import BatchV2

    rng = np.random.RandomState(0)
    t = len(cfg.frames)
    cams = cfg.data.num_cams
    h, w = cfg.data.img_size
    g = 6
    gt_boxes = rng.randn(bs, g, 9).astype(np.float32)
    gt_boxes[..., 3:6] = np.abs(gt_boxes[..., 3:6]) + 0.5
    mono_targets = None
    inv_k = None
    if with_mono:
        mono_targets = _mk_targets(rng, bs * cams, 4, w, h)
        f = 100.0
        ik = np.linalg.inv(np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]]))
        inv_k = jnp.array(np.tile(ik[None, None], (bs, cams, 1, 1)), jnp.float32)
    return BatchV2(
        images=jnp.array(rng.randn(bs, t, cams, h, w, 3) * 0.1, jnp.float32),
        lidar2img=jnp.broadcast_to(jnp.eye(4), (bs, t, cams, 4, 4)).astype(
            jnp.float32
        ),
        frame_valid=jnp.ones((bs, t), bool),
        flip=jnp.zeros((bs,), bool),
        bda_mat=jnp.broadcast_to(jnp.eye(2), (bs, 2, 2)).astype(jnp.float32),
        gt_boxes=jnp.array(gt_boxes),
        gt_labels=jnp.array(rng.randint(0, 10, (bs, g)), jnp.int32),
        num_gt=jnp.array([4] * bs, jnp.int32),
        inv_intrinsics=inv_k,
        mono_targets=mono_targets,
    )


def test_v2_train_step_multiframe():
    from bevformer_tpu.models.detector_v2 import BEVFormerV2
    from bevformer_tpu.runtime import optim
    from bevformer_tpu.runtime.train_v2 import (
        TrainStateV2, init_state_v2, make_train_step_v2,
    )

    cfg = mini_v2_config()  # frames (-1, 0), no mono
    model = BEVFormerV2(cfg=cfg)
    batch = make_batch_v2(cfg)
    rng = jax.random.PRNGKey(0)
    state = init_state_v2(model, _Tx(), rng, batch)
    tx, _ = optim.make_optimizer(cfg.optim, state.params, 100)
    state = TrainStateV2(state.step, state.params, state.batch_stats, tx.init(state.params))
    step = make_train_step_v2(model, tx)
    state1, metrics = step(state, batch, rng)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(state1.step) == 1
    # BN stats must have moved
    d = [
        float(jnp.abs(a - b).max())
        for a, b in zip(
            jax.tree.leaves(state.batch_stats), jax.tree.leaves(state1.batch_stats)
        )
    ]
    assert max(d) > 0


def test_v2_train_step_with_mono():
    from bevformer_tpu.models.detector_v2 import BEVFormerV2
    from bevformer_tpu.runtime import optim
    from bevformer_tpu.runtime.train_v2 import (
        TrainStateV2, init_state_v2, make_train_step_v2,
    )

    cfg = mini_v2_config(frames=(0,), num_mono_levels=5)
    model = BEVFormerV2(cfg=cfg)
    batch = make_batch_v2(cfg, with_mono=True)
    rng = jax.random.PRNGKey(0)
    state = init_state_v2(model, _Tx(), rng, batch)
    tx, _ = optim.make_optimizer(cfg.optim, state.params, 100)
    state = TrainStateV2(state.step, state.params, state.batch_stats, tx.init(state.params))
    step = make_train_step_v2(model, tx)
    state1, metrics = step(state, batch, rng)
    assert any(k.endswith("_mono") for k in metrics), metrics.keys()
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))


class _Tx:
    def init(self, params):
        return ()

    def update(self, grads, state, params=None):
        return grads, state
