"""Training step: temporal history unroll + loss + AdamW update.

Functional equivalent of the reference training path
(`detectors/bevformer.py:158-234` + mmcv OptimizerHook): the `queue_length-1`
history frames run encoder-only under stop_gradient with dropout/grid-mask
off (the reference switches to eval mode, `bevformer.py:161`), the final
frame trains with the resulting prev_bev. One jitted function; data parallel
comes from 'dp'-sharded batch inputs (XLA inserts the gradient psums).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from bevformer_tpu.configs import BEVFormerConfig
from bevformer_tpu.core.losses import bevformer_loss
from bevformer_tpu.models.detector import BEVFormer


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


class Batch(NamedTuple):
    """One training batch. T = queue_length; the last frame is trained.

    Shapes (B = global batch):
      images:      [B, T, cams, H, W, 3]  normalized float32
      can_bus:     [B, T, 18]             relative deltas (union2one format)
      lidar2img:   [B, T, cams, 4, 4]
      prev_exists: [B, T]                 bool (scene continuity per frame)
      gt_boxes:    [B, G, 9]              gravity-center z, padded
      gt_labels:   [B, G]
      num_gt:      [B]
    """

    images: jnp.ndarray
    can_bus: jnp.ndarray
    lidar2img: jnp.ndarray
    prev_exists: jnp.ndarray
    gt_boxes: jnp.ndarray
    gt_labels: jnp.ndarray
    num_gt: jnp.ndarray


def history_bev(
    model: BEVFormer, params, batch: Batch
) -> Tuple[Optional[jnp.ndarray], jnp.ndarray]:
    """Run frames 0..T-2 encoder-only, no grad (`bevformer.py:158-177`)."""
    t = batch.images.shape[1]
    if t == 1:
        return None, jnp.zeros(batch.images.shape[:1], bool)
    bs = batch.images.shape[0]
    bev_size = model.cfg.bev_h * model.cfg.bev_w
    prev = jnp.zeros((bs, bev_size, model.cfg.embed_dims), jnp.float32)
    has = jnp.zeros((bs,), bool)
    # batch the backbone over ALL history frames at once (the reference
    # reshapes to bs*(T-1) imgs, `bevformer.py:167`); history compute is
    # cut from the gradient by the stop_gradient on the bev carry, so XLA
    # dead-code-eliminates its backward exactly like torch.no_grad()
    cams, h, w = batch.images.shape[2:5]
    imgs_hist = batch.images[:, : t - 1].reshape(bs * (t - 1), cams, h, w, 3)
    feats_hist = model.apply(
        params, imgs_hist, method="extract_feat"
    )
    feats_hist = [
        f.reshape((bs, t - 1) + f.shape[1:]) for f in feats_hist
    ]
    for i in range(t - 1):
        exists = batch.prev_exists[:, i]
        has = has & exists  # scene break resets history
        bev = model.apply(
            params,
            batch.images[:, i],
            batch.can_bus[:, i],
            batch.lidar2img[:, i],
            prev,
            has,
            only_bev=True,
            training=False,
            feats=[f[:, i] for f in feats_hist],
        )
        prev = jax.lax.stop_gradient(bev.astype(jnp.float32))
        has = jnp.ones((bs,), bool)
    # final frame's history validity comes from its own prev_exists flag
    has = batch.prev_exists[:, t - 1]
    return prev, has


def loss_fn(model: BEVFormer, params, batch: Batch, rng) -> Tuple[jnp.ndarray, Dict]:
    c = model.cfg
    prev_bev, has_prev = history_bev(model, params, batch)
    if prev_bev is None:
        bs = batch.images.shape[0]
        prev_bev = jnp.zeros(
            (bs, c.bev_h * c.bev_w, c.embed_dims), jnp.float32
        )
        has_prev = jnp.zeros((bs,), bool)

    rngs = {"dropout": rng, "grid_mask": jax.random.fold_in(rng, 1)}
    preds = model.apply(
        params,
        batch.images[:, -1],
        batch.can_bus[:, -1],
        batch.lidar2img[:, -1],
        prev_bev,
        has_prev,
        training=True,
        rngs=rngs,
    )
    losses = bevformer_loss(
        preds,
        batch.gt_boxes,
        batch.gt_labels,
        batch.num_gt,
        c.code_weights,
        num_classes=c.num_classes,
        cls_loss_weight=c.cls_loss_weight,
        bbox_loss_weight=c.bbox_loss_weight,
        focal_alpha=c.focal_alpha,
        focal_gamma=c.focal_gamma,
        group_detr=c.group_detr,
        num_query=c.num_query,
    )
    return losses["total"], losses


def make_train_step(model: BEVFormer, tx, *, check_grads: bool = False):
    """check_grads: additionally return per-parameter grad L2 norms so the
    trainer can list untrained (all-zero-grad) parameters — the reference's
    GradChecker hook (`models/hooks/hooks.py:6-12`). Opt-in: it is a
    separate compile and a large metrics pytree."""

    @jax.jit
    def train_step(state: TrainState, batch: Batch, rng):
        (_, losses), grads = jax.value_and_grad(
            lambda p: loss_fn(model, p, batch, rng), has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, opt_state)
        metrics = dict(losses)
        metrics["grad_norm"] = optax.global_norm(grads)
        if check_grads:
            metrics["per_param_grad_norm"] = jax.tree.map(
                lambda g: jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32)))),
                grads,
            )
        return new_state, metrics

    return train_step


def unused_param_report(per_param_grad_norm, params, frozen_stages: int = 1,
                        bn_trainable: bool = False) -> list:
    """Names of parameters with identically-zero gradients, excluding the
    deliberately frozen groups — the reference GradChecker's 'params not
    used in loss' listing (`models/hooks/hooks.py:6-12`). frozen_stages /
    bn_trainable must match the model's optim config (V2 trains its full
    backbone with live BN) or genuinely-dead params are mis-excluded."""
    from bevformer_tpu.runtime.optim import label_params

    labels = label_params(params, frozen_stages, bn_trainable)
    names = []
    flat_n, _ = jax.tree_util.tree_flatten_with_path(per_param_grad_norm)
    flat_l, _ = jax.tree_util.tree_flatten_with_path(labels)
    for (path, norm), (_, label) in zip(flat_n, flat_l):
        if label == "frozen":
            continue
        if float(norm) == 0.0:
            names.append(
                "/".join(str(getattr(k, "key", k)) for k in path)
            )
    return names


def init_state(model: BEVFormer, tx, rng, sample_batch: Batch) -> TrainState:
    c = model.cfg
    bs = sample_batch.images.shape[0]
    prev = jnp.zeros((bs, c.bev_h * c.bev_w, c.embed_dims), jnp.float32)
    has = jnp.zeros((bs,), bool)
    # jit the init: un-jitted tracing executes op-by-op, which is very slow
    # over remote-TPU transports
    params = jax.jit(model.init)(
        {"params": rng, "dropout": rng, "grid_mask": rng},
        sample_batch.images[:, -1],
        sample_batch.can_bus[:, -1],
        sample_batch.lidar2img[:, -1],
        prev,
        has,
    )
    opt_state = tx.init(params)
    return TrainState(jnp.zeros((), jnp.int32), params, opt_state)
