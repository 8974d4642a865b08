"""Optimizer: AdamW + cosine schedule + grad clip + param-group lr mults.

Mirrors the reference training recipe (`configs/bevformer/bevformer_base.py:
228-244`): AdamW lr 2e-4, weight_decay 0.01, backbone lr_mult 0.1, grad clip
max_norm 35 (L2), CosineAnnealing to lr*1e-3 with 500-iter linear warmup from
lr/3. Backbone stem + stage 1 are fully frozen (`frozen_stages=1`,
`bevformer_base.py:49`), and FrozenBN statistics never train.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from bevformer_tpu.configs import OptimConfig

def _frozen_prefixes(frozen_stages: int):
    # frozen_stages semantics as in mmdet ResNet (`mmdet/models/backbones/
    # resnet.py::_freeze_stages`): 0 freezes the stem only, 1 adds layer1,
    # 2 adds layer2, ...; <0 freezes nothing
    if frozen_stages < 0:
        return ()
    return ("stem_",) + tuple(
        f"layer{i}_" for i in range(1, frozen_stages + 1)
    )


def _path_str(path) -> str:
    return "/".join(getattr(p, "key", str(p)) for p in path)


def label_params(params, frozen_stages: int = 1,
                 bn_trainable: bool = False) -> Any:
    """'frozen' (frozen stages + FrozenBN), 'backbone' (lr x0.1), 'main'.

    bn_trainable=True for the V2 backbone (SyncBN, `norm_eval=False`,
    `bevformerv2-r50-t1-24ep.py:177-179` uses frozen_stages=-1): BN
    scale/bias train like any other backbone param there."""
    prefixes = _frozen_prefixes(frozen_stages)

    def label(path, _):
        s = _path_str(path)
        if "img_backbone" in s:
            parts = s.split("/")
            sub = parts[parts.index("img_backbone") + 1] if "img_backbone" in parts else ""
            if prefixes and sub.startswith(prefixes):
                return "frozen"
            # FrozenBN params are constants everywhere in the v1 backbone
            if not bn_trainable and (
                "/bn" in s or "downsample_bn" in s
                or s.endswith("/mean") or s.endswith("/var")
            ):
                return "frozen"
            return "backbone"
        return "main"

    return jax.tree_util.tree_map_with_path(label, params)


def cosine_schedule(cfg: OptimConfig, total_steps: int):
    warmup = optax.linear_schedule(
        cfg.lr * cfg.warmup_ratio, cfg.lr, cfg.warmup_iters
    )
    cosine = optax.cosine_decay_schedule(
        cfg.lr,
        max(total_steps - cfg.warmup_iters, 1),
        alpha=cfg.min_lr_ratio,
    )
    return optax.join_schedules([warmup, cosine], [cfg.warmup_iters])


def make_optimizer(cfg: OptimConfig, params, total_steps: int,
                   bn_trainable: bool = False):
    sched = cosine_schedule(cfg, total_steps)

    def adamw(lr_mult):
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_learning_rate(
                lambda step: sched(step) * lr_mult
            ),
        )

    tx = optax.chain(
        # global clip over ALL grads, like mmcv's OptimizerHook
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.multi_transform(
            {
                "main": adamw(1.0),
                "backbone": adamw(cfg.backbone_lr_mult),
                "frozen": optax.set_to_zero(),
            },
            label_params(params, cfg.frozen_stages, bn_trainable),
        ),
    )
    return tx, sched
