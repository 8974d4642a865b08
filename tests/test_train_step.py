"""End-to-end train step on a (dp=4, sp=2) virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_model import mini_config
import pytest

# compile-heavy (full model / Pallas kernel graphs): slow tier
pytestmark = pytest.mark.slow


def make_batch(cfg, bs=4, t=2, g=6):
    rng = np.random.RandomState(0)
    cams = cfg.data.num_cams
    h, w = cfg.data.img_size
    from bevformer_tpu.runtime.train import Batch

    gt_boxes = rng.randn(bs, g, 9).astype(np.float32)
    gt_boxes[..., 3:6] = np.abs(gt_boxes[..., 3:6]) + 0.5
    return Batch(
        images=jnp.array(rng.randn(bs, t, cams, h, w, 3), jnp.float32),
        can_bus=jnp.array(rng.randn(bs, t, 18) * 0.1, jnp.float32),
        lidar2img=jnp.broadcast_to(jnp.eye(4), (bs, t, cams, 4, 4)).astype(
            jnp.float32
        ),
        prev_exists=jnp.ones((bs, t), bool),
        gt_boxes=jnp.array(gt_boxes),
        gt_labels=jnp.array(rng.randint(0, 10, (bs, g)), jnp.int32),
        num_gt=jnp.array(([3, 6, 0, 2] * ((bs + 3) // 4))[:bs], jnp.int32),
    )


def test_train_step_on_mesh():
    from bevformer_tpu.models import BEVFormer
    from bevformer_tpu.runtime import mesh as mesh_lib
    from bevformer_tpu.runtime import optim, train

    cfg = mini_config()
    model = BEVFormer(cfg=cfg)
    batch = make_batch(cfg)

    m = mesh_lib.make_mesh(dp=4, sp=2)
    with mesh_lib.activate(m):
        sharded = mesh_lib.shard_batch(m, batch)
        state0 = None
        rng = jax.random.PRNGKey(0)
        params = None
        state = train.init_state(
            model,
            optim.make_optimizer(cfg.optim, _dummy_params(model, cfg), 100)[0],
            rng,
            batch,
        )
        tx, _ = optim.make_optimizer(cfg.optim, state.params, 100)
        state = train.TrainState(state.step, state.params, tx.init(state.params))
        step_fn = train.make_train_step(model, tx)
        state1, metrics = step_fn(state, sharded, rng)
        assert int(state1.step) == 1
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        # params actually changed
        d = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), state.params, state1.params
        )
        assert max(jax.tree.leaves(d)) > 0

        # second step reuses the compiled function
        state2, metrics2 = step_fn(state1, sharded, jax.random.PRNGKey(1))
        assert int(state2.step) == 2


def _dummy_params(model, cfg):
    import jax

    batch = make_batch(cfg, bs=1, t=1)
    prev = jnp.zeros((1, cfg.bev_h * cfg.bev_w, cfg.embed_dims), jnp.float32)
    has = jnp.zeros((1,), bool)
    return jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0),
             "grid_mask": jax.random.PRNGKey(0)},
            batch.images[:, -1],
            batch.can_bus[:, -1],
            batch.lidar2img[:, -1],
            prev,
            has,
        )
    )


def test_frozen_params_stay_frozen():
    from bevformer_tpu.models import BEVFormer
    from bevformer_tpu.runtime import optim, train

    cfg = mini_config()
    model = BEVFormer(cfg=cfg)
    batch = make_batch(cfg, bs=1)
    rng = jax.random.PRNGKey(0)
    state = train.init_state(model, _IdentityTx(), rng, batch)
    tx, _ = optim.make_optimizer(cfg.optim, state.params, 100)
    state = train.TrainState(state.step, state.params, tx.init(state.params))
    step_fn = train.make_train_step(model, tx)
    state1, _ = step_fn(state, batch, rng)

    p0 = state.params["params"]["img_backbone"]
    p1 = state1.params["params"]["img_backbone"]
    # stem (frozen_stages=1) must not move; BN stats must never move
    stem0, stem1 = p0["stem_conv"]["kernel"], p1["stem_conv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(stem0), np.asarray(stem1))
    bn0 = p0["layer4_block0"]["bn1"]["mean"]
    bn1 = p1["layer4_block0"]["bn1"]["mean"]
    np.testing.assert_array_equal(np.asarray(bn0), np.asarray(bn1))
    # a non-frozen backbone conv should move
    c0 = np.asarray(p0["layer4_block0"]["conv1"]["kernel"])
    c1 = np.asarray(p1["layer4_block0"]["conv1"]["kernel"])
    assert np.abs(c0 - c1).max() > 0


class _IdentityTx:
    def init(self, params):
        return ()

    def update(self, grads, state, params=None):
        return grads, state


def test_remat_matches_no_remat():
    """use_remat must not change loss value, gradients, or param tree."""
    import dataclasses

    from bevformer_tpu.models import BEVFormer
    from bevformer_tpu.runtime import train

    cfg = mini_config()
    cfg_r = dataclasses.replace(cfg, use_remat=True)
    batch = make_batch(cfg, bs=1, t=2, g=4)
    rng = jax.random.PRNGKey(0)

    model = BEVFormer(cfg=cfg)
    model_r = BEVFormer(cfg=cfg_r)
    params = jax.jit(model.init)(
        rng,
        batch.images[:, -1],
        batch.can_bus[:, -1],
        batch.lidar2img[:, -1],
        None,
        jnp.zeros((1,), bool),
    )
    # identical param trees: remat must not rename or restructure
    params_r = jax.jit(model_r.init)(
        rng,
        batch.images[:, -1],
        batch.can_bus[:, -1],
        batch.lidar2img[:, -1],
        None,
        jnp.zeros((1,), bool),
    )
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_r
    )

    def total(m, p):
        loss, _ = train.loss_fn(m, p, batch, jax.random.PRNGKey(1))
        return loss

    l0, g0 = jax.value_and_grad(lambda p: total(model, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: total(model_r, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_unused_param_report():
    """check_grads metrics + GradChecker-style listing: params cut off from
    the loss must be reported by name; live params must not."""
    import jax
    import jax.numpy as jnp
    from bevformer_tpu.runtime import train

    # synthetic per-param norms: one zeroed non-frozen param
    params = {
        "pts_bbox_head": {
            "bev_embedding": jnp.ones((4, 8)),
            "cls_branch0": {"fc0": {"kernel": jnp.ones((8, 8))}},
        },
        "img_backbone": {"stem_conv": {"kernel": jnp.ones((7, 7, 3, 64))}},
    }
    norms = jax.tree.map(lambda x: jnp.float32(1.0), params)
    norms["pts_bbox_head"]["cls_branch0"]["fc0"]["kernel"] = jnp.float32(0.0)
    # frozen group zero-grad must NOT be reported
    norms["img_backbone"]["stem_conv"]["kernel"] = jnp.float32(0.0)

    unused = train.unused_param_report(norms, params)
    assert unused == ["pts_bbox_head/cls_branch0/fc0/kernel"], unused
