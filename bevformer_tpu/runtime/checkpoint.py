"""Checkpointing: Orbax save/restore + reference `.pth` weight conversion.

Replaces mmcv CheckpointHook / `load_checkpoint` (`tools/test.py:209-212`)
and provides the `.pth -> JAX pytree` converter needed to run the reference
model zoo (`docs/install.md:57-63`). Resume restores params, optimizer state
and step counter (`apis/mmdet_train.py:195-198` equivalent).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Orbax save/restore
# ---------------------------------------------------------------------------

def save_checkpoint(ckpt_dir: str, state, step: int, keep: int = 3):
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(
        ckpt_dir, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    ) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(_to_pytree(state)))
        mgr.wait_until_finished()


def restore_checkpoint(ckpt_dir: str, state, step: Optional[int] = None):
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore(_to_pytree(state))
        )
    from bevformer_tpu.runtime.train import TrainState

    return TrainState(
        step=restored["step"],
        params=restored["params"],
        opt_state=jax.tree.unflatten(
            jax.tree.structure(state.opt_state),
            jax.tree.leaves(restored["opt_state"]),
        ),
    )


def _to_pytree(state) -> Dict[str, Any]:
    tree = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
    }
    # V2 states carry BatchNorm batch_stats (`TrainStateV2`)
    if getattr(state, "batch_stats", None) is not None:
        tree["batch_stats"] = state.batch_stats
    return tree


def restore_checkpoint_v2(ckpt_dir: str, state, step: Optional[int] = None):
    """Restore a `TrainStateV2` (params + batch_stats + opt state)."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore(_to_pytree(state))
        )
    from bevformer_tpu.runtime.train_v2 import TrainStateV2

    return TrainStateV2(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored.get("batch_stats", state.batch_stats),
        opt_state=jax.tree.unflatten(
            jax.tree.structure(state.opt_state),
            jax.tree.leaves(restored["opt_state"]),
        ),
    )


# ---------------------------------------------------------------------------
# Reference .pth conversion
# ---------------------------------------------------------------------------

def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv [O, I, kh, kw] -> flax [kh, kw, I, O]."""
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w: np.ndarray) -> np.ndarray:
    """torch linear [O, I] -> flax kernel [I, O]."""
    return np.transpose(w, (1, 0))


class _TrackingDict(dict):
    """Records which keys the converter consumed so leftovers can be
    reported — a silently-ignored tensor means a silently-uninitialized
    (or wrongly mapped) parameter."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.consumed = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)

    def __contains__(self, k):
        self.consumed.add(k)
        return super().__contains__(k)


def convert_reference_state_dict(
    state_dict: Dict[str, np.ndarray], cfg, *, strict: bool = True
) -> Dict[str, Any]:
    """Map a reference BEVFormer `.pth` state_dict into our param pytree.

    Handles: ResNet backbone (+DCN), FPN, head embeddings/branches,
    PerceptionTransformer (can_bus mlp, embeds, encoder TSA/SCA, decoder).
    Returns a nested dict matching `model.init(...)['params']`.

    strict: raise if any state_dict tensor was NOT consumed by the mapping
    (missing tensors always raise KeyError). The reference `.pth` contains
    nothing beyond model tensors after the `num_batches_tracked` filter
    (`tools/test.py:209-212` loads with the same key set).
    """
    sd = _TrackingDict(
        {
            k: np.asarray(v)
            for k, v in state_dict.items()
            if not k.endswith("num_batches_tracked")
        }
    )
    p: Dict[str, Any] = {}

    def put(path: str, value: np.ndarray):
        node = p
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(value)

    # ---------------- backbone ----------------
    def bn(dst, src):
        put(f"{dst}/scale", sd[f"{src}.weight"])
        put(f"{dst}/bias", sd[f"{src}.bias"])
        put(f"{dst}/mean", sd[f"{src}.running_mean"])
        put(f"{dst}/var", sd[f"{src}.running_var"])

    bb = "img_backbone"
    put(f"{bb}/stem_conv/kernel", _conv_kernel(sd["img_backbone.conv1.weight"]))
    bn(f"{bb}/stem_bn", "img_backbone.bn1")
    from bevformer_tpu.models.resnet import ARCH_SETTINGS

    blocks = ARCH_SETTINGS[cfg.backbone_depth]

    def block_tensors(src: str, use_dcn: bool) -> Dict[str, np.ndarray]:
        """One torch bottleneck -> our per-block tensor dict."""
        t: Dict[str, np.ndarray] = {}
        t["conv1/kernel"] = _conv_kernel(sd[f"{src}.conv1.weight"])
        if use_dcn:
            w = sd[f"{src}.conv2.weight"]  # [O, I, 3, 3]
            o, i, kh, kw = w.shape
            # ours: [tap*in + i, O] with tap = ky*3+kx
            t["conv2/kernel"] = np.transpose(w, (2, 3, 1, 0)).reshape(
                kh * kw * i, o
            )
            t["conv2/conv_offset/kernel"] = _conv_kernel(
                sd[f"{src}.conv2.conv_offset.weight"]
            )
            t["conv2/conv_offset/bias"] = sd[f"{src}.conv2.conv_offset.bias"]
        else:
            t["conv2/kernel"] = _conv_kernel(sd[f"{src}.conv2.weight"])
        t["conv3/kernel"] = _conv_kernel(sd[f"{src}.conv3.weight"])
        for i_bn in (1, 2, 3):
            for suffix, tsuf in (
                ("scale", "weight"),
                ("bias", "bias"),
                ("mean", "running_mean"),
                ("var", "running_var"),
            ):
                t[f"bn{i_bn}/{suffix}"] = sd[f"{src}.bn{i_bn}.{tsuf}"]
        if f"{src}.downsample.0.weight" in sd:
            t["downsample_conv/kernel"] = _conv_kernel(
                sd[f"{src}.downsample.0.weight"]
            )
            for suffix, tsuf in (
                ("scale", "weight"),
                ("bias", "bias"),
                ("mean", "running_mean"),
                ("var", "running_var"),
            ):
                t[f"downsample_bn/{suffix}"] = sd[f"{src}.downsample.1.{tsuf}"]
        return t

    for stage, nblocks in enumerate(blocks):
        use_dcn = stage in cfg.backbone_dcn_stages
        # block 0: named module
        t0 = block_tensors(f"img_backbone.layer{stage + 1}.0", use_dcn)
        for key, val in t0.items():
            put(f"{bb}/layer{stage + 1}_block0/{key}", val)
        # blocks 1..n-1: stacked along the nn.scan axis
        if nblocks > 1:
            rest = [
                block_tensors(f"img_backbone.layer{stage + 1}.{blk}", use_dcn)
                for blk in range(1, nblocks)
            ]
            for key in rest[0]:
                put(
                    f"{bb}/layer{stage + 1}_rest/block/{key}",
                    np.stack([r[key] for r in rest]),
                )

    # ---------------- neck ----------------
    nlevels = len(cfg.neck_in_channels)
    for i in range(nlevels):
        put(
            f"img_neck/lateral{i}/kernel",
            _conv_kernel(sd[f"img_neck.lateral_convs.{i}.conv.weight"]),
        )
        put(f"img_neck/lateral{i}/bias", sd[f"img_neck.lateral_convs.{i}.conv.bias"])
    for i in range(cfg.num_feature_levels):
        put(
            f"img_neck/fpn{i}/kernel",
            _conv_kernel(sd[f"img_neck.fpn_convs.{i}.conv.weight"]),
        )
        put(f"img_neck/fpn{i}/bias", sd[f"img_neck.fpn_convs.{i}.conv.bias"])

    # ---------------- head ----------------
    hd = "pts_bbox_head"
    put(f"{hd}/bev_embedding", sd[f"{hd}.bev_embedding.weight"])
    put(f"{hd}/query_embedding", sd[f"{hd}.query_embedding.weight"])
    put(
        f"{hd}/positional_encoding/row_embed",
        sd[f"{hd}.positional_encoding.row_embed.weight"],
    )
    put(
        f"{hd}/positional_encoding/col_embed",
        sd[f"{hd}.positional_encoding.col_embed.weight"],
    )
    for lid in range(cfg.decoder_layers):
        csrc = f"{hd}.cls_branches.{lid}"
        put(f"{hd}/cls_branch{lid}/fc0/kernel", _linear(sd[f"{csrc}.0.weight"]))
        put(f"{hd}/cls_branch{lid}/fc0/bias", sd[f"{csrc}.0.bias"])
        put(f"{hd}/cls_branch{lid}/ln0/scale", sd[f"{csrc}.1.weight"])
        put(f"{hd}/cls_branch{lid}/ln0/bias", sd[f"{csrc}.1.bias"])
        put(f"{hd}/cls_branch{lid}/fc1/kernel", _linear(sd[f"{csrc}.3.weight"]))
        put(f"{hd}/cls_branch{lid}/fc1/bias", sd[f"{csrc}.3.bias"])
        put(f"{hd}/cls_branch{lid}/ln1/scale", sd[f"{csrc}.4.weight"])
        put(f"{hd}/cls_branch{lid}/ln1/bias", sd[f"{csrc}.4.bias"])
        put(f"{hd}/cls_branch{lid}/out/kernel", _linear(sd[f"{csrc}.6.weight"]))
        put(f"{hd}/cls_branch{lid}/out/bias", sd[f"{csrc}.6.bias"])
        rsrc = f"{hd}.reg_branches.{lid}"
        put(f"{hd}/reg_branch{lid}/fc0/kernel", _linear(sd[f"{rsrc}.0.weight"]))
        put(f"{hd}/reg_branch{lid}/fc0/bias", sd[f"{rsrc}.0.bias"])
        put(f"{hd}/reg_branch{lid}/fc1/kernel", _linear(sd[f"{rsrc}.2.weight"]))
        put(f"{hd}/reg_branch{lid}/fc1/bias", sd[f"{rsrc}.2.bias"])
        put(f"{hd}/reg_branch{lid}/out/kernel", _linear(sd[f"{rsrc}.4.weight"]))
        put(f"{hd}/reg_branch{lid}/out/bias", sd[f"{rsrc}.4.bias"])

    # ---------------- transformer ----------------
    tr = f"{hd}.transformer"
    trd = f"{hd}/transformer"
    put(f"{trd}/level_embeds", sd[f"{tr}.level_embeds"])
    put(f"{trd}/cams_embeds", sd[f"{tr}.cams_embeds"])
    put(f"{trd}/reference_points/kernel", _linear(sd[f"{tr}.reference_points.weight"]))
    put(f"{trd}/reference_points/bias", sd[f"{tr}.reference_points.bias"])
    put(f"{trd}/can_bus_fc1/kernel", _linear(sd[f"{tr}.can_bus_mlp.0.weight"]))
    put(f"{trd}/can_bus_fc1/bias", sd[f"{tr}.can_bus_mlp.0.bias"])
    put(f"{trd}/can_bus_fc2/kernel", _linear(sd[f"{tr}.can_bus_mlp.2.weight"]))
    put(f"{trd}/can_bus_fc2/bias", sd[f"{tr}.can_bus_mlp.2.bias"])
    if f"{tr}.can_bus_mlp.norm.weight" in sd:
        put(f"{trd}/can_bus_ln/scale", sd[f"{tr}.can_bus_mlp.norm.weight"])
        put(f"{trd}/can_bus_ln/bias", sd[f"{tr}.can_bus_mlp.norm.bias"])

    def deform_attn(dst, src, has_out_proj=True):
        put(f"{dst}/sampling_offsets/kernel", _linear(sd[f"{src}.sampling_offsets.weight"]))
        put(f"{dst}/sampling_offsets/bias", sd[f"{src}.sampling_offsets.bias"])
        put(f"{dst}/attention_weights/kernel", _linear(sd[f"{src}.attention_weights.weight"]))
        put(f"{dst}/attention_weights/bias", sd[f"{src}.attention_weights.bias"])
        put(f"{dst}/value_proj/kernel", _linear(sd[f"{src}.value_proj.weight"]))
        put(f"{dst}/value_proj/bias", sd[f"{src}.value_proj.bias"])
        if has_out_proj:
            put(f"{dst}/output_proj/kernel", _linear(sd[f"{src}.output_proj.weight"]))
            put(f"{dst}/output_proj/bias", sd[f"{src}.output_proj.bias"])

    def layer_norms(dst, src, n=3):
        for i in range(n):
            put(f"{dst}/norm{i + 1}/scale", sd[f"{src}.norms.{i}.weight"])
            put(f"{dst}/norm{i + 1}/bias", sd[f"{src}.norms.{i}.bias"])

    def ffn(dst, src):
        put(f"{dst}/fc1/kernel", _linear(sd[f"{src}.layers.0.0.weight"]))
        put(f"{dst}/fc1/bias", sd[f"{src}.layers.0.0.bias"])
        put(f"{dst}/fc2/kernel", _linear(sd[f"{src}.layers.1.weight"]))
        put(f"{dst}/fc2/bias", sd[f"{src}.layers.1.bias"])

    # encoder layers (stacked along the nn.scan axis):
    # attentions.0 = TSA, attentions.1 = SCA
    def enc_layer_tensors(lid: int) -> Dict[str, np.ndarray]:
        src = f"{tr}.encoder.layers.{lid}"
        t: Dict[str, np.ndarray] = {}

        def lin(dst_key, src_key):
            t[f"{dst_key}/kernel"] = _linear(sd[f"{src_key}.weight"])
            t[f"{dst_key}/bias"] = sd[f"{src_key}.bias"]

        for nm in ("sampling_offsets", "attention_weights", "value_proj",
                   "output_proj"):
            lin(f"self_attn/{nm}", f"{src}.attentions.0.{nm}")
        sca = f"{src}.attentions.1"
        for nm in ("sampling_offsets", "attention_weights", "value_proj"):
            lin(
                f"cross_attn/deformable_attention/{nm}",
                f"{sca}.deformable_attention.{nm}",
            )
        lin("cross_attn/output_proj", f"{sca}.output_proj")
        for i in range(3):
            t[f"norm{i + 1}/scale"] = sd[f"{src}.norms.{i}.weight"]
            t[f"norm{i + 1}/bias"] = sd[f"{src}.norms.{i}.bias"]
        lin("ffn/fc1", f"{src}.ffns.0.layers.0.0")
        lin("ffn/fc2", f"{src}.ffns.0.layers.1")
        return t

    enc_layers = [enc_layer_tensors(l) for l in range(cfg.encoder_layers)]
    for key in enc_layers[0]:
        put(
            f"{trd}/encoder/layers/layer/{key}",
            np.stack([t[key] for t in enc_layers]),
        )

    # decoder layers: attentions.0 = MHA, attentions.1 = CustomMSDA
    for lid in range(cfg.decoder_layers):
        src = f"{tr}.decoder.layers.{lid}"
        dst = f"{trd}/decoder/layer{lid}"
        mha = f"{src}.attentions.0.attn"
        in_w = sd[f"{mha}.in_proj_weight"]
        in_b = sd[f"{mha}.in_proj_bias"]
        e = in_w.shape[1]
        for i, nm in enumerate(("q_proj", "k_proj", "v_proj")):
            put(f"{dst}/self_attn/{nm}/kernel", _linear(in_w[i * e : (i + 1) * e]))
            put(f"{dst}/self_attn/{nm}/bias", in_b[i * e : (i + 1) * e])
        put(f"{dst}/self_attn/out_proj/kernel", _linear(sd[f"{mha}.out_proj.weight"]))
        put(f"{dst}/self_attn/out_proj/bias", sd[f"{mha}.out_proj.bias"])
        deform_attn(f"{dst}/cross_attn", f"{src}.attentions.1")
        layer_norms(dst, src)
        ffn(f"{dst}/ffn", f"{src}.ffns.0")

    if strict:
        leftovers = sorted(set(sd) - sd.consumed)
        if leftovers:
            raise ValueError(
                f"{len(leftovers)} reference tensors not consumed by the "
                f"converter (first 20): {leftovers[:20]}"
            )
    return p


def convert_reference_state_dict_v2(
    state_dict: Dict[str, np.ndarray], cfg, *, strict: bool = True
) -> Dict[str, Any]:
    """Map a reference BEVFormerV2 `.pth` state_dict into our variables.

    Returns {'params': ..., 'batch_stats': ...} matching
    `BEVFormerV2.init(...)`. Covers: ResNet backbone with REAL BatchNorm
    (V2 trains BN, `bevformerv2-r50-t1-24ep.py:164-180` — running stats go
    to batch_stats), FPN with extra output convs, BEVFormerHead_GroupDETR
    (query_embedding has num_query*group_detr rows), PerceptionTransformerV2
    (no can_bus MLP; ResNetFusion when len(frames) > 1,
    `transformerV2.py:16-51,200-213`), encoder/decoder (same module keys as
    v1), and the NuscenesDD3D mono head (FCOS2D/FCOS3D towers with
    per-level ModuleListDial BN, detectron2 Conv2d-with-norm 'v2' layout,
    `dd3d/modeling/fcos2d.py:77-100`, `fcos3d.py:85-151`,
    `nuscenes_dd3d.py:344-345`) when its keys are present."""
    sd = _TrackingDict(
        {
            k: np.asarray(v)
            for k, v in state_dict.items()
            if not k.endswith("num_batches_tracked")
        }
    )
    p: Dict[str, Any] = {}
    bstats: Dict[str, Any] = {}

    def put_into(root, path, value):
        node = root
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(value)

    def put(path, value):
        put_into(p, path, value)

    def bn(dst, src):
        """Real BN: scale/bias -> params, running stats -> batch_stats."""
        put_into(p, f"{dst}/scale", sd[f"{src}.weight"])
        put_into(p, f"{dst}/bias", sd[f"{src}.bias"])
        put_into(bstats, f"{dst}/mean", sd[f"{src}.running_mean"])
        put_into(bstats, f"{dst}/var", sd[f"{src}.running_var"])

    # ---------------- backbone (BN) ----------------
    bb = "img_backbone"
    put(f"{bb}/stem_conv/kernel", _conv_kernel(sd["img_backbone.conv1.weight"]))
    bn(f"{bb}/stem_bn/bn", "img_backbone.bn1")
    from bevformer_tpu.models.resnet import ARCH_SETTINGS

    blocks = ARCH_SETTINGS[cfg.backbone_depth]

    def block_v2(dst, src):
        put(f"{dst}/conv1/kernel", _conv_kernel(sd[f"{src}.conv1.weight"]))
        put(f"{dst}/conv2/kernel", _conv_kernel(sd[f"{src}.conv2.weight"]))
        put(f"{dst}/conv3/kernel", _conv_kernel(sd[f"{src}.conv3.weight"]))
        for i_bn in (1, 2, 3):
            bn(f"{dst}/bn{i_bn}/bn", f"{src}.bn{i_bn}")
        if f"{src}.downsample.0.weight" in sd:
            put(
                f"{dst}/downsample_conv/kernel",
                _conv_kernel(sd[f"{src}.downsample.0.weight"]),
            )
            bn(f"{dst}/downsample_bn/bn", f"{src}.downsample.1")

    for stage, nblocks in enumerate(blocks):
        block_v2(f"{bb}/layer{stage + 1}_block0",
                 f"img_backbone.layer{stage + 1}.0")
        if nblocks > 1:
            rests_p, rests_s = [], []
            for blk in range(1, nblocks):
                sub_p: Dict[str, Any] = {}
                sub_s: Dict[str, Any] = {}

                def bput(path, value, root=sub_p):
                    put_into(root, path, value)

                src = f"img_backbone.layer{stage + 1}.{blk}"
                bput("conv1/kernel", _conv_kernel(sd[f"{src}.conv1.weight"]))
                bput("conv2/kernel", _conv_kernel(sd[f"{src}.conv2.weight"]))
                bput("conv3/kernel", _conv_kernel(sd[f"{src}.conv3.weight"]))
                for i_bn in (1, 2, 3):
                    bput(f"bn{i_bn}/bn/scale", sd[f"{src}.bn{i_bn}.weight"])
                    bput(f"bn{i_bn}/bn/bias", sd[f"{src}.bn{i_bn}.bias"])
                    bput(f"bn{i_bn}/bn/mean",
                         sd[f"{src}.bn{i_bn}.running_mean"], sub_s)
                    bput(f"bn{i_bn}/bn/var",
                         sd[f"{src}.bn{i_bn}.running_var"], sub_s)
                rests_p.append(sub_p)
                rests_s.append(sub_s)

            def stack_into(root, subs, prefix):
                flat0 = jax.tree_util.tree_flatten_with_path(subs[0])[0]
                for path, _ in flat0:
                    key = "/".join(str(getattr(k, "key", k)) for k in path)

                    def get(tree):
                        node = tree
                        for part in key.split("/"):
                            node = node[part]
                        return node

                    put_into(
                        root, f"{prefix}/{key}",
                        np.stack([np.asarray(get(s)) for s in subs]),
                    )

            stack_into(p, rests_p, f"{bb}/layer{stage + 1}_rest/block")
            stack_into(bstats, rests_s, f"{bb}/layer{stage + 1}_rest/block")

    # ---------------- neck (extra output convs) ----------------
    nlevels = len(cfg.neck_in_channels)
    for i in range(nlevels):
        put(
            f"img_neck/lateral{i}/kernel",
            _conv_kernel(sd[f"img_neck.lateral_convs.{i}.conv.weight"]),
        )
        put(f"img_neck/lateral{i}/bias",
            sd[f"img_neck.lateral_convs.{i}.conv.bias"])
    nouts = max(cfg.num_mono_levels, cfg.num_feature_levels)
    for i in range(nouts):
        put(
            f"img_neck/fpn{i}/kernel",
            _conv_kernel(sd[f"img_neck.fpn_convs.{i}.conv.weight"]),
        )
        put(f"img_neck/fpn{i}/bias", sd[f"img_neck.fpn_convs.{i}.conv.bias"])

    # ---------------- head ----------------
    hd = "pts_bbox_head"
    put(f"{hd}/bev_embedding", sd[f"{hd}.bev_embedding.weight"])
    put(f"{hd}/query_embedding", sd[f"{hd}.query_embedding.weight"])
    put(
        f"{hd}/positional_encoding/row_embed",
        sd[f"{hd}.positional_encoding.row_embed.weight"],
    )
    put(
        f"{hd}/positional_encoding/col_embed",
        sd[f"{hd}.positional_encoding.col_embed.weight"],
    )
    for lid in range(cfg.decoder_layers):
        csrc = f"{hd}.cls_branches.{lid}"
        put(f"{hd}/cls_branch{lid}/fc0/kernel", _linear(sd[f"{csrc}.0.weight"]))
        put(f"{hd}/cls_branch{lid}/fc0/bias", sd[f"{csrc}.0.bias"])
        put(f"{hd}/cls_branch{lid}/ln0/scale", sd[f"{csrc}.1.weight"])
        put(f"{hd}/cls_branch{lid}/ln0/bias", sd[f"{csrc}.1.bias"])
        put(f"{hd}/cls_branch{lid}/fc1/kernel", _linear(sd[f"{csrc}.3.weight"]))
        put(f"{hd}/cls_branch{lid}/fc1/bias", sd[f"{csrc}.3.bias"])
        put(f"{hd}/cls_branch{lid}/ln1/scale", sd[f"{csrc}.4.weight"])
        put(f"{hd}/cls_branch{lid}/ln1/bias", sd[f"{csrc}.4.bias"])
        put(f"{hd}/cls_branch{lid}/out/kernel", _linear(sd[f"{csrc}.6.weight"]))
        put(f"{hd}/cls_branch{lid}/out/bias", sd[f"{csrc}.6.bias"])
        rsrc = f"{hd}.reg_branches.{lid}"
        put(f"{hd}/reg_branch{lid}/fc0/kernel", _linear(sd[f"{rsrc}.0.weight"]))
        put(f"{hd}/reg_branch{lid}/fc0/bias", sd[f"{rsrc}.0.bias"])
        put(f"{hd}/reg_branch{lid}/fc1/kernel", _linear(sd[f"{rsrc}.2.weight"]))
        put(f"{hd}/reg_branch{lid}/fc1/bias", sd[f"{rsrc}.2.bias"])
        put(f"{hd}/reg_branch{lid}/out/kernel", _linear(sd[f"{rsrc}.4.weight"]))
        put(f"{hd}/reg_branch{lid}/out/bias", sd[f"{rsrc}.4.bias"])

    # ---------------- transformer (V2: no can_bus; fusion) ----------------
    tr = f"{hd}.transformer"
    trd = f"{hd}/transformer"
    put(f"{trd}/level_embeds", sd[f"{tr}.level_embeds"])
    put(f"{trd}/cams_embeds", sd[f"{tr}.cams_embeds"])
    put(f"{trd}/reference_points/kernel",
        _linear(sd[f"{tr}.reference_points.weight"]))
    put(f"{trd}/reference_points/bias", sd[f"{tr}.reference_points.bias"])

    if len(cfg.frames) > 1:
        # ResNetFusion: BasicBlocks + Linear/LayerNorm head
        i = 0
        while f"{tr}.fusion.layers.{i}.conv1.weight" in sd:
            fsrc = f"{tr}.fusion.layers.{i}"
            fdst = f"{trd}/fusion/block{i}"
            put(f"{fdst}/conv1/kernel", _conv_kernel(sd[f"{fsrc}.conv1.weight"]))
            put(f"{fdst}/conv2/kernel", _conv_kernel(sd[f"{fsrc}.conv2.weight"]))
            bn(f"{fdst}/bn1/bn", f"{fsrc}.bn1")
            bn(f"{fdst}/bn2/bn", f"{fsrc}.bn2")
            if f"{fsrc}.downsample.0.weight" in sd:
                put(
                    f"{fdst}/downsample_conv/kernel",
                    _conv_kernel(sd[f"{fsrc}.downsample.0.weight"]),
                )
                bn(f"{fdst}/downsample_bn/bn", f"{fsrc}.downsample.1")
            i += 1
        put(f"{trd}/fusion/out_fc/kernel",
            _linear(sd[f"{tr}.fusion.layer_norm.0.weight"]))
        put(f"{trd}/fusion/out_fc/bias", sd[f"{tr}.fusion.layer_norm.0.bias"])
        put(f"{trd}/fusion/out_ln/scale",
            sd[f"{tr}.fusion.layer_norm.1.weight"])
        put(f"{trd}/fusion/out_ln/bias", sd[f"{tr}.fusion.layer_norm.1.bias"])

    # encoder layers (scan-stacked; same torch keys as v1)
    def enc_layer_tensors(lid: int) -> Dict[str, np.ndarray]:
        src = f"{tr}.encoder.layers.{lid}"
        t: Dict[str, np.ndarray] = {}

        def lin(dst_key, src_key):
            t[f"{dst_key}/kernel"] = _linear(sd[f"{src_key}.weight"])
            t[f"{dst_key}/bias"] = sd[f"{src_key}.bias"]

        for nm in ("sampling_offsets", "attention_weights", "value_proj",
                   "output_proj"):
            lin(f"self_attn/{nm}", f"{src}.attentions.0.{nm}")
        sca = f"{src}.attentions.1"
        for nm in ("sampling_offsets", "attention_weights", "value_proj"):
            lin(
                f"cross_attn/deformable_attention/{nm}",
                f"{sca}.deformable_attention.{nm}",
            )
        lin("cross_attn/output_proj", f"{sca}.output_proj")
        for i in range(3):
            t[f"norm{i + 1}/scale"] = sd[f"{src}.norms.{i}.weight"]
            t[f"norm{i + 1}/bias"] = sd[f"{src}.norms.{i}.bias"]
        lin("ffn/fc1", f"{src}.ffns.0.layers.0.0")
        lin("ffn/fc2", f"{src}.ffns.0.layers.1")
        return t

    enc_layers = [enc_layer_tensors(l) for l in range(cfg.encoder_layers)]
    for key in enc_layers[0]:
        put(
            f"{trd}/encoder/layers/layer/{key}",
            np.stack([t[key] for t in enc_layers]),
        )

    # decoder layers (GroupMultiheadAttention wraps nn.MultiheadAttention —
    # identical key layout to v1, `group_attention.py:64`)
    for lid in range(cfg.decoder_layers):
        src = f"{tr}.decoder.layers.{lid}"
        dst = f"{trd}/decoder/layer{lid}"
        mha = f"{src}.attentions.0.attn"
        in_w = sd[f"{mha}.in_proj_weight"]
        in_b = sd[f"{mha}.in_proj_bias"]
        e = in_w.shape[1]
        for i, nm in enumerate(("q_proj", "k_proj", "v_proj")):
            put(f"{dst}/self_attn/{nm}/kernel",
                _linear(in_w[i * e: (i + 1) * e]))
            put(f"{dst}/self_attn/{nm}/bias", in_b[i * e: (i + 1) * e])
        put(f"{dst}/self_attn/out_proj/kernel",
            _linear(sd[f"{mha}.out_proj.weight"]))
        put(f"{dst}/self_attn/out_proj/bias", sd[f"{mha}.out_proj.bias"])
        ca = f"{src}.attentions.1"
        put(f"{dst}/cross_attn/sampling_offsets/kernel",
            _linear(sd[f"{ca}.sampling_offsets.weight"]))
        put(f"{dst}/cross_attn/sampling_offsets/bias",
            sd[f"{ca}.sampling_offsets.bias"])
        put(f"{dst}/cross_attn/attention_weights/kernel",
            _linear(sd[f"{ca}.attention_weights.weight"]))
        put(f"{dst}/cross_attn/attention_weights/bias",
            sd[f"{ca}.attention_weights.bias"])
        put(f"{dst}/cross_attn/value_proj/kernel",
            _linear(sd[f"{ca}.value_proj.weight"]))
        put(f"{dst}/cross_attn/value_proj/bias", sd[f"{ca}.value_proj.bias"])
        put(f"{dst}/cross_attn/output_proj/kernel",
            _linear(sd[f"{ca}.output_proj.weight"]))
        put(f"{dst}/cross_attn/output_proj/bias",
            sd[f"{ca}.output_proj.bias"])
        for i in range(3):
            put(f"{dst}/norm{i + 1}/scale", sd[f"{src}.norms.{i}.weight"])
            put(f"{dst}/norm{i + 1}/bias", sd[f"{src}.norms.{i}.bias"])
        put(f"{dst}/ffn/fc1/kernel",
            _linear(sd[f"{src}.ffns.0.layers.0.0.weight"]))
        put(f"{dst}/ffn/fc1/bias", sd[f"{src}.ffns.0.layers.0.0.bias"])
        put(f"{dst}/ffn/fc2/kernel",
            _linear(sd[f"{src}.ffns.0.layers.1.weight"]))
        put(f"{dst}/ffn/fc2/bias", sd[f"{src}.ffns.0.layers.1.bias"])

    # ---------------- NuscenesDD3D mono head (training-only) ----------------
    f3 = "fcos3d_bbox_head"
    if cfg.num_mono_levels > 0 and f"{f3}.fcos2d_head.cls_logits.weight" in sd:
        nl = cfg.num_mono_levels

        def tower(dst, src, nconv):
            # detectron2 Conv2d-with-norm ('v2'): conv bias absent, norm is
            # a per-level ModuleListDial of BNs (`fcos2d.py:77-100`)
            for i in range(nconv):
                put(f"{f3}/{dst}/conv{i}/kernel",
                    _conv_kernel(sd[f"{src}.{i}.weight"]))
                for lvl in range(nl):
                    bsrc = f"{src}.{i}.norm.{lvl}"
                    put(f"{f3}/{dst}/bn{i}_l{lvl}/scale", sd[f"{bsrc}.weight"])
                    put(f"{f3}/{dst}/bn{i}_l{lvl}/bias", sd[f"{bsrc}.bias"])
                    put_into(bstats, f"{f3}/{dst}/bn{i}_l{lvl}/mean",
                             sd[f"{bsrc}.running_mean"])
                    put_into(bstats, f"{f3}/{dst}/bn{i}_l{lvl}/var",
                             sd[f"{bsrc}.running_var"])

        f2 = f"{f3}.fcos2d_head"
        f3h = f"{f3}.fcos3d_head"
        tower("cls_tower", f"{f2}.cls_tower", 4)
        tower("box2d_tower", f"{f2}.box2d_tower", 4)
        tower("box3d_tower", f"{f3h}.box3d_tower", 4)
        for nm in ("cls_logits", "box2d_reg", "centerness"):
            put(f"{f3}/{nm}/kernel", _conv_kernel(sd[f"{f2}.{nm}.weight"]))
            put(f"{f3}/{nm}/bias", sd[f"{f2}.{nm}.bias"])
        for nm in ("box3d_quat", "box3d_ctr", "box3d_size", "box3d_conf"):
            put(f"{f3}/{nm}/kernel",
                _conv_kernel(sd[f"{f3h}.{nm}.0.weight"]))
            put(f"{f3}/{nm}/bias", sd[f"{f3h}.{nm}.0.bias"])
        # box3d_depth has NO bias when use_scale (`fcos3d.py:128`)
        dw = sd[f"{f3h}.box3d_depth.0.weight"]
        put(f"{f3}/box3d_depth/kernel", _conv_kernel(dw))
        put(f"{f3}/box3d_depth/bias", np.zeros((dw.shape[0],), dw.dtype))
        for nm in ("attr_logits", "speed"):
            put(f"{f3}/{nm}/kernel", _conv_kernel(sd[f"{f3}.{nm}.weight"]))
            put(f"{f3}/{nm}/bias", sd[f"{f3}.{nm}.bias"])
        for lvl in range(nl):
            put(f"{f3}/scale_box2d_l{lvl}",
                sd[f"{f2}.scales_box2d_reg.{lvl}.scale"].reshape(()))
            put(f"{f3}/scale_proj_ctr_l{lvl}",
                sd[f"{f3h}.scales_proj_ctr.{lvl}.scale"].reshape(()))
            put(f"{f3}/scale_size_l{lvl}",
                sd[f"{f3h}.scales_size.{lvl}.scale"].reshape(()))
            put(f"{f3}/scale_conf_l{lvl}",
                sd[f"{f3h}.scales_conf.{lvl}.scale"].reshape(()))
            put(f"{f3}/scale_depth_l{lvl}",
                sd[f"{f3h}.scales_depth.{lvl}.scale"].reshape(()))
            put(f"{f3}/offset_depth_l{lvl}",
                sd[f"{f3h}.offsets_depth.{lvl}.bias"].reshape(()))
        # registered buffers = config constants; consume them
        _ = sd.get(f"{f3h}.mean_depth_per_level")
        sd.consumed.add(f"{f3h}.mean_depth_per_level")
        _ = sd.get(f"{f3h}.std_depth_per_level")
        sd.consumed.add(f"{f3h}.std_depth_per_level")

    if strict:
        leftovers = sorted(set(sd) - sd.consumed)
        if leftovers:
            raise ValueError(
                f"{len(leftovers)} reference tensors not consumed by the "
                f"V2 converter (first 20): {leftovers[:20]}"
            )
    return {"params": p, "batch_stats": bstats}


def export_reference_state_dict(params: Dict[str, Any], cfg) -> Dict[str, np.ndarray]:
    """Inverse of `convert_reference_state_dict`: our pytree -> reference
    `.pth`-style state_dict (torch key names / layouts). Used for
    cross-checking against the reference implementation and for publishing
    weights in the reference format."""
    p = params["params"] if "params" in params else params
    sd: Dict[str, np.ndarray] = {}

    def get(path: str) -> np.ndarray:
        node = p
        for part in path.split("/"):
            node = node[part]
        return np.asarray(node)

    def put_conv(dst, src):
        sd[f"{dst}.weight"] = np.transpose(get(f"{src}/kernel"), (3, 2, 0, 1))

    def put_linear(dst, src):
        sd[f"{dst}.weight"] = np.transpose(get(f"{src}/kernel"), (1, 0))
        sd[f"{dst}.bias"] = get(f"{src}/bias")

    def put_bn(dst, src):
        sd[f"{dst}.weight"] = get(f"{src}/scale")
        sd[f"{dst}.bias"] = get(f"{src}/bias")
        sd[f"{dst}.running_mean"] = get(f"{src}/mean")
        sd[f"{dst}.running_var"] = get(f"{src}/var")

    from bevformer_tpu.models.resnet import ARCH_SETTINGS

    put_conv("img_backbone.conv1", "img_backbone/stem_conv")
    put_bn("img_backbone.bn1", "img_backbone/stem_bn")

    def export_block(dst: str, node: Dict[str, Any], use_dcn: bool):
        def npv(path):
            n = node
            for part in path.split("/"):
                n = n[part]
            return np.asarray(n)

        if use_dcn:
            wk = npv("conv2/kernel")  # [9*in, out]
            o = wk.shape[1]
            i = wk.shape[0] // 9
            sd[f"{dst}.conv2.weight"] = np.transpose(
                wk.reshape(3, 3, i, o), (3, 2, 0, 1)
            )
            sd[f"{dst}.conv2.conv_offset.weight"] = np.transpose(
                npv("conv2/conv_offset/kernel"), (3, 2, 0, 1)
            )
            sd[f"{dst}.conv2.conv_offset.bias"] = npv("conv2/conv_offset/bias")
        else:
            sd[f"{dst}.conv2.weight"] = np.transpose(
                npv("conv2/kernel"), (3, 2, 0, 1)
            )
        for cname in ("conv1", "conv3"):
            sd[f"{dst}.{cname}.weight"] = np.transpose(
                npv(f"{cname}/kernel"), (3, 2, 0, 1)
            )
        for ib in (1, 2, 3):
            sd[f"{dst}.bn{ib}.weight"] = npv(f"bn{ib}/scale")
            sd[f"{dst}.bn{ib}.bias"] = npv(f"bn{ib}/bias")
            sd[f"{dst}.bn{ib}.running_mean"] = npv(f"bn{ib}/mean")
            sd[f"{dst}.bn{ib}.running_var"] = npv(f"bn{ib}/var")
        if "downsample_conv" in node:
            sd[f"{dst}.downsample.0.weight"] = np.transpose(
                npv("downsample_conv/kernel"), (3, 2, 0, 1)
            )
            sd[f"{dst}.downsample.1.weight"] = npv("downsample_bn/scale")
            sd[f"{dst}.downsample.1.bias"] = npv("downsample_bn/bias")
            sd[f"{dst}.downsample.1.running_mean"] = npv("downsample_bn/mean")
            sd[f"{dst}.downsample.1.running_var"] = npv("downsample_bn/var")

    for stage, nblocks in enumerate(ARCH_SETTINGS[cfg.backbone_depth]):
        use_dcn = stage in cfg.backbone_dcn_stages
        export_block(
            f"img_backbone.layer{stage + 1}.0",
            p["img_backbone"][f"layer{stage + 1}_block0"],
            use_dcn,
        )
        if nblocks > 1:
            stacked = p["img_backbone"][f"layer{stage + 1}_rest"]["block"]
            for blk in range(1, nblocks):
                node = jax.tree.map(lambda x, b=blk: np.asarray(x)[b - 1], stacked)
                export_block(
                    f"img_backbone.layer{stage + 1}.{blk}", node, use_dcn
                )

    for i in range(len(cfg.neck_in_channels)):
        put_conv(f"img_neck.lateral_convs.{i}.conv", f"img_neck/lateral{i}")
        sd[f"img_neck.lateral_convs.{i}.conv.bias"] = get(
            f"img_neck/lateral{i}/bias"
        )
    for i in range(cfg.num_feature_levels):
        put_conv(f"img_neck.fpn_convs.{i}.conv", f"img_neck/fpn{i}")
        sd[f"img_neck.fpn_convs.{i}.conv.bias"] = get(f"img_neck/fpn{i}/bias")

    hd = "pts_bbox_head"
    sd[f"{hd}.bev_embedding.weight"] = get(f"{hd}/bev_embedding")
    sd[f"{hd}.query_embedding.weight"] = get(f"{hd}/query_embedding")
    sd[f"{hd}.positional_encoding.row_embed.weight"] = get(
        f"{hd}/positional_encoding/row_embed"
    )
    sd[f"{hd}.positional_encoding.col_embed.weight"] = get(
        f"{hd}/positional_encoding/col_embed"
    )
    for lid in range(cfg.decoder_layers):
        put_linear(f"{hd}.cls_branches.{lid}.0", f"{hd}/cls_branch{lid}/fc0")
        sd[f"{hd}.cls_branches.{lid}.1.weight"] = get(f"{hd}/cls_branch{lid}/ln0/scale")
        sd[f"{hd}.cls_branches.{lid}.1.bias"] = get(f"{hd}/cls_branch{lid}/ln0/bias")
        put_linear(f"{hd}.cls_branches.{lid}.3", f"{hd}/cls_branch{lid}/fc1")
        sd[f"{hd}.cls_branches.{lid}.4.weight"] = get(f"{hd}/cls_branch{lid}/ln1/scale")
        sd[f"{hd}.cls_branches.{lid}.4.bias"] = get(f"{hd}/cls_branch{lid}/ln1/bias")
        put_linear(f"{hd}.cls_branches.{lid}.6", f"{hd}/cls_branch{lid}/out")
        put_linear(f"{hd}.reg_branches.{lid}.0", f"{hd}/reg_branch{lid}/fc0")
        put_linear(f"{hd}.reg_branches.{lid}.2", f"{hd}/reg_branch{lid}/fc1")
        put_linear(f"{hd}.reg_branches.{lid}.4", f"{hd}/reg_branch{lid}/out")

    tr = f"{hd}.transformer"
    trd = f"{hd}/transformer"
    sd[f"{tr}.level_embeds"] = get(f"{trd}/level_embeds")
    sd[f"{tr}.cams_embeds"] = get(f"{trd}/cams_embeds")
    put_linear(f"{tr}.reference_points", f"{trd}/reference_points")
    put_linear(f"{tr}.can_bus_mlp.0", f"{trd}/can_bus_fc1")
    put_linear(f"{tr}.can_bus_mlp.2", f"{trd}/can_bus_fc2")
    tnode = p["pts_bbox_head"]["transformer"]
    if "can_bus_ln" in tnode:
        sd[f"{tr}.can_bus_mlp.norm.weight"] = get(f"{trd}/can_bus_ln/scale")
        sd[f"{tr}.can_bus_mlp.norm.bias"] = get(f"{trd}/can_bus_ln/bias")

    def exp_deform(dst, src, has_out=True):
        put_linear(f"{dst}.sampling_offsets", f"{src}/sampling_offsets")
        put_linear(f"{dst}.attention_weights", f"{src}/attention_weights")
        put_linear(f"{dst}.value_proj", f"{src}/value_proj")
        if has_out:
            put_linear(f"{dst}.output_proj", f"{src}/output_proj")

    def exp_norms(dst, src):
        for i in range(3):
            sd[f"{dst}.norms.{i}.weight"] = get(f"{src}/norm{i + 1}/scale")
            sd[f"{dst}.norms.{i}.bias"] = get(f"{src}/norm{i + 1}/bias")

    def exp_ffn(dst, src):
        put_linear(f"{dst}.layers.0.0", f"{src}/fc1")
        put_linear(f"{dst}.layers.1", f"{src}/fc2")

    # encoder layers: unstack the nn.scan axis
    enc_stacked = p["pts_bbox_head"]["transformer"]["encoder"]["layers"]["layer"]
    for lid in range(cfg.encoder_layers):
        node = jax.tree.map(lambda x, l=lid: np.asarray(x)[l], enc_stacked)
        dst = f"{tr}.encoder.layers.{lid}"

        def npv(path):
            n = node
            for part in path.split("/"):
                n = n[part]
            return np.asarray(n)

        def exl(dkey, skey):
            sd[f"{dkey}.weight"] = np.transpose(npv(f"{skey}/kernel"), (1, 0))
            sd[f"{dkey}.bias"] = npv(f"{skey}/bias")

        for nm in ("sampling_offsets", "attention_weights", "value_proj",
                   "output_proj"):
            exl(f"{dst}.attentions.0.{nm}", f"self_attn/{nm}")
        for nm in ("sampling_offsets", "attention_weights", "value_proj"):
            exl(
                f"{dst}.attentions.1.deformable_attention.{nm}",
                f"cross_attn/deformable_attention/{nm}",
            )
        exl(f"{dst}.attentions.1.output_proj", "cross_attn/output_proj")
        for i in range(3):
            sd[f"{dst}.norms.{i}.weight"] = npv(f"norm{i + 1}/scale")
            sd[f"{dst}.norms.{i}.bias"] = npv(f"norm{i + 1}/bias")
        exl(f"{dst}.ffns.0.layers.0.0", "ffn/fc1")
        exl(f"{dst}.ffns.0.layers.1", "ffn/fc2")

    for lid in range(cfg.decoder_layers):
        src = f"{trd}/decoder/layer{lid}"
        dst = f"{tr}.decoder.layers.{lid}"
        qw = np.transpose(get(f"{src}/self_attn/q_proj/kernel"), (1, 0))
        kw = np.transpose(get(f"{src}/self_attn/k_proj/kernel"), (1, 0))
        vw = np.transpose(get(f"{src}/self_attn/v_proj/kernel"), (1, 0))
        sd[f"{dst}.attentions.0.attn.in_proj_weight"] = np.concatenate([qw, kw, vw], 0)
        sd[f"{dst}.attentions.0.attn.in_proj_bias"] = np.concatenate(
            [
                get(f"{src}/self_attn/q_proj/bias"),
                get(f"{src}/self_attn/k_proj/bias"),
                get(f"{src}/self_attn/v_proj/bias"),
            ]
        )
        put_linear(f"{dst}.attentions.0.attn.out_proj", f"{src}/self_attn/out_proj")
        exp_deform(f"{dst}.attentions.1", f"{src}/cross_attn")
        exp_norms(dst, src)
        exp_ffn(f"{dst}.ffns.0", f"{src}/ffn")

    return sd


def export_reference_state_dict_v2(
    variables: Dict[str, Any], cfg
) -> Dict[str, np.ndarray]:
    """Inverse of `convert_reference_state_dict_v2`: our V2 variables
    ({'params', 'batch_stats'}) -> reference BEVFormerV2 torch state_dict
    (key names / layouts). Round-trip pinned by tests/test_checkpoint.py."""
    p = variables["params"]
    bs = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}

    def get(tree, path):
        node = tree
        for part in path.split("/"):
            node = node[part]
        return np.asarray(node)

    def put_conv(dst, src):
        sd[f"{dst}.weight"] = np.transpose(get(p, f"{src}/kernel"), (3, 2, 0, 1))

    def put_linear(dst, src):
        sd[f"{dst}.weight"] = np.transpose(get(p, f"{src}/kernel"), (1, 0))
        sd[f"{dst}.bias"] = get(p, f"{src}/bias")

    def put_bn(dst, src):
        sd[f"{dst}.weight"] = get(p, f"{src}/scale")
        sd[f"{dst}.bias"] = get(p, f"{src}/bias")
        sd[f"{dst}.running_mean"] = get(bs, f"{src}/mean")
        sd[f"{dst}.running_var"] = get(bs, f"{src}/var")

    # backbone
    put_conv("img_backbone.conv1", "img_backbone/stem_conv")
    put_bn("img_backbone.bn1", "img_backbone/stem_bn/bn")
    from bevformer_tpu.models.resnet import ARCH_SETTINGS

    blocks = ARCH_SETTINGS[cfg.backbone_depth]
    for stage, nblocks in enumerate(blocks):
        b0 = f"img_backbone/layer{stage + 1}_block0"
        dst0 = f"img_backbone.layer{stage + 1}.0"
        for ci in (1, 2, 3):
            put_conv(f"{dst0}.conv{ci}", f"{b0}/conv{ci}")
            put_bn(f"{dst0}.bn{ci}", f"{b0}/bn{ci}/bn")
        if "downsample_conv" in p["img_backbone"][f"layer{stage + 1}_block0"]:
            put_conv(f"{dst0}.downsample.0", f"{b0}/downsample_conv")
            put_bn(f"{dst0}.downsample.1", f"{b0}/downsample_bn/bn")
        if nblocks > 1:
            sp = p["img_backbone"][f"layer{stage + 1}_rest"]["block"]
            ss = bs["img_backbone"][f"layer{stage + 1}_rest"]["block"]
            for blk in range(1, nblocks):
                dstb = f"img_backbone.layer{stage + 1}.{blk}"
                for ci in (1, 2, 3):
                    sd[f"{dstb}.conv{ci}.weight"] = np.transpose(
                        np.asarray(sp[f"conv{ci}"]["kernel"])[blk - 1],
                        (3, 2, 0, 1),
                    )
                    bn_p = sp[f"bn{ci}"]["bn"]
                    bn_s = ss[f"bn{ci}"]["bn"]
                    sd[f"{dstb}.bn{ci}.weight"] = np.asarray(
                        bn_p["scale"])[blk - 1]
                    sd[f"{dstb}.bn{ci}.bias"] = np.asarray(
                        bn_p["bias"])[blk - 1]
                    sd[f"{dstb}.bn{ci}.running_mean"] = np.asarray(
                        bn_s["mean"])[blk - 1]
                    sd[f"{dstb}.bn{ci}.running_var"] = np.asarray(
                        bn_s["var"])[blk - 1]

    # neck
    for i in range(len(cfg.neck_in_channels)):
        put_conv(f"img_neck.lateral_convs.{i}.conv", f"img_neck/lateral{i}")
        sd[f"img_neck.lateral_convs.{i}.conv.bias"] = get(
            p, f"img_neck/lateral{i}/bias"
        )
    for i in range(max(cfg.num_mono_levels, cfg.num_feature_levels)):
        put_conv(f"img_neck.fpn_convs.{i}.conv", f"img_neck/fpn{i}")
        sd[f"img_neck.fpn_convs.{i}.conv.bias"] = get(
            p, f"img_neck/fpn{i}/bias"
        )

    # head
    hd = "pts_bbox_head"
    sd[f"{hd}.bev_embedding.weight"] = get(p, f"{hd}/bev_embedding")
    sd[f"{hd}.query_embedding.weight"] = get(p, f"{hd}/query_embedding")
    sd[f"{hd}.positional_encoding.row_embed.weight"] = get(
        p, f"{hd}/positional_encoding/row_embed"
    )
    sd[f"{hd}.positional_encoding.col_embed.weight"] = get(
        p, f"{hd}/positional_encoding/col_embed"
    )
    for lid in range(cfg.decoder_layers):
        put_linear(f"{hd}.cls_branches.{lid}.0", f"{hd}/cls_branch{lid}/fc0")
        sd[f"{hd}.cls_branches.{lid}.1.weight"] = get(
            p, f"{hd}/cls_branch{lid}/ln0/scale")
        sd[f"{hd}.cls_branches.{lid}.1.bias"] = get(
            p, f"{hd}/cls_branch{lid}/ln0/bias")
        put_linear(f"{hd}.cls_branches.{lid}.3", f"{hd}/cls_branch{lid}/fc1")
        sd[f"{hd}.cls_branches.{lid}.4.weight"] = get(
            p, f"{hd}/cls_branch{lid}/ln1/scale")
        sd[f"{hd}.cls_branches.{lid}.4.bias"] = get(
            p, f"{hd}/cls_branch{lid}/ln1/bias")
        put_linear(f"{hd}.cls_branches.{lid}.6", f"{hd}/cls_branch{lid}/out")
        put_linear(f"{hd}.reg_branches.{lid}.0", f"{hd}/reg_branch{lid}/fc0")
        put_linear(f"{hd}.reg_branches.{lid}.2", f"{hd}/reg_branch{lid}/fc1")
        put_linear(f"{hd}.reg_branches.{lid}.4", f"{hd}/reg_branch{lid}/out")

    # transformer
    tr = f"{hd}.transformer"
    trd = f"{hd}/transformer"
    sd[f"{tr}.level_embeds"] = get(p, f"{trd}/level_embeds")
    sd[f"{tr}.cams_embeds"] = get(p, f"{trd}/cams_embeds")
    put_linear(f"{tr}.reference_points", f"{trd}/reference_points")

    if len(cfg.frames) > 1:
        fnode = p["pts_bbox_head"]["transformer"]["fusion"]
        i = 0
        while f"block{i}" in fnode:
            fsrc = f"{trd}/fusion/block{i}"
            fdst = f"{tr}.fusion.layers.{i}"
            put_conv(f"{fdst}.conv1", f"{fsrc}/conv1")
            put_conv(f"{fdst}.conv2", f"{fsrc}/conv2")
            put_bn(f"{fdst}.bn1", f"{fsrc}/bn1/bn")
            put_bn(f"{fdst}.bn2", f"{fsrc}/bn2/bn")
            if "downsample_conv" in fnode[f"block{i}"]:
                put_conv(f"{fdst}.downsample.0", f"{fsrc}/downsample_conv")
                put_bn(f"{fdst}.downsample.1", f"{fsrc}/downsample_bn/bn")
            i += 1
        put_linear(f"{tr}.fusion.layer_norm.0", f"{trd}/fusion/out_fc")
        sd[f"{tr}.fusion.layer_norm.1.weight"] = get(
            p, f"{trd}/fusion/out_ln/scale")
        sd[f"{tr}.fusion.layer_norm.1.bias"] = get(
            p, f"{trd}/fusion/out_ln/bias")

    # encoder (unstack the scan axis)
    enc_stacked = p["pts_bbox_head"]["transformer"]["encoder"]["layers"]["layer"]
    for lid in range(cfg.encoder_layers):
        node = jax.tree.map(lambda x, l=lid: np.asarray(x)[l], enc_stacked)
        dst = f"{tr}.encoder.layers.{lid}"

        def npv(path, node=node):
            n = node
            for part in path.split("/"):
                n = n[part]
            return np.asarray(n)

        def exl(dkey, skey, npv=npv):
            sd[f"{dkey}.weight"] = np.transpose(npv(f"{skey}/kernel"), (1, 0))
            sd[f"{dkey}.bias"] = npv(f"{skey}/bias")

        for nm in ("sampling_offsets", "attention_weights", "value_proj",
                   "output_proj"):
            exl(f"{dst}.attentions.0.{nm}", f"self_attn/{nm}")
        for nm in ("sampling_offsets", "attention_weights", "value_proj"):
            exl(
                f"{dst}.attentions.1.deformable_attention.{nm}",
                f"cross_attn/deformable_attention/{nm}",
            )
        exl(f"{dst}.attentions.1.output_proj", "cross_attn/output_proj")
        for i in range(3):
            sd[f"{dst}.norms.{i}.weight"] = npv(f"norm{i + 1}/scale")
            sd[f"{dst}.norms.{i}.bias"] = npv(f"norm{i + 1}/bias")
        exl(f"{dst}.ffns.0.layers.0.0", "ffn/fc1")
        exl(f"{dst}.ffns.0.layers.1", "ffn/fc2")

    # decoder
    for lid in range(cfg.decoder_layers):
        src = f"{trd}/decoder/layer{lid}"
        dst = f"{tr}.decoder.layers.{lid}"
        qw = np.transpose(get(p, f"{src}/self_attn/q_proj/kernel"), (1, 0))
        kw = np.transpose(get(p, f"{src}/self_attn/k_proj/kernel"), (1, 0))
        vw = np.transpose(get(p, f"{src}/self_attn/v_proj/kernel"), (1, 0))
        sd[f"{dst}.attentions.0.attn.in_proj_weight"] = np.concatenate(
            [qw, kw, vw], 0)
        sd[f"{dst}.attentions.0.attn.in_proj_bias"] = np.concatenate(
            [
                get(p, f"{src}/self_attn/q_proj/bias"),
                get(p, f"{src}/self_attn/k_proj/bias"),
                get(p, f"{src}/self_attn/v_proj/bias"),
            ]
        )
        put_linear(f"{dst}.attentions.0.attn.out_proj",
                   f"{src}/self_attn/out_proj")
        for nm in ("sampling_offsets", "attention_weights", "value_proj",
                   "output_proj"):
            put_linear(f"{dst}.attentions.1.{nm}", f"{src}/cross_attn/{nm}")
        for i in range(3):
            sd[f"{dst}.norms.{i}.weight"] = get(p, f"{src}/norm{i + 1}/scale")
            sd[f"{dst}.norms.{i}.bias"] = get(p, f"{src}/norm{i + 1}/bias")
        put_linear(f"{dst}.ffns.0.layers.0.0", f"{src}/ffn/fc1")
        put_linear(f"{dst}.ffns.0.layers.1", f"{src}/ffn/fc2")

    # DD3D mono head
    f3 = "fcos3d_bbox_head"
    if cfg.num_mono_levels > 0 and f3 in p:
        nl = cfg.num_mono_levels
        f2 = f"{f3}.fcos2d_head"
        f3h = f"{f3}.fcos3d_head"

        def tower(dst, src, nconv):
            for i in range(nconv):
                put_conv(f"{dst}.{i}", f"{f3}/{src}/conv{i}")
                for lvl in range(nl):
                    bdst = f"{dst}.{i}.norm.{lvl}"
                    sd[f"{bdst}.weight"] = get(
                        p, f"{f3}/{src}/bn{i}_l{lvl}/scale")
                    sd[f"{bdst}.bias"] = get(
                        p, f"{f3}/{src}/bn{i}_l{lvl}/bias")
                    sd[f"{bdst}.running_mean"] = get(
                        bs, f"{f3}/{src}/bn{i}_l{lvl}/mean")
                    sd[f"{bdst}.running_var"] = get(
                        bs, f"{f3}/{src}/bn{i}_l{lvl}/var")

        tower(f"{f2}.cls_tower", "cls_tower", 4)
        tower(f"{f2}.box2d_tower", "box2d_tower", 4)
        tower(f"{f3h}.box3d_tower", "box3d_tower", 4)
        for nm in ("cls_logits", "box2d_reg", "centerness"):
            put_conv(f"{f2}.{nm}", f"{f3}/{nm}")
            sd[f"{f2}.{nm}.bias"] = get(p, f"{f3}/{nm}/bias")
        for nm in ("box3d_quat", "box3d_ctr", "box3d_size", "box3d_conf"):
            put_conv(f"{f3h}.{nm}.0", f"{f3}/{nm}")
            sd[f"{f3h}.{nm}.0.bias"] = get(p, f"{f3}/{nm}/bias")
        put_conv(f"{f3h}.box3d_depth.0", f"{f3}/box3d_depth")
        for nm in ("attr_logits", "speed"):
            put_conv(f"{f3}.{nm}", f"{f3}/{nm}")
            sd[f"{f3}.{nm}.bias"] = get(p, f"{f3}/{nm}/bias")
        for lvl in range(nl):
            sd[f"{f2}.scales_box2d_reg.{lvl}.scale"] = get(
                p, f"{f3}/scale_box2d_l{lvl}").reshape(1)
            sd[f"{f3h}.scales_proj_ctr.{lvl}.scale"] = get(
                p, f"{f3}/scale_proj_ctr_l{lvl}").reshape(1)
            sd[f"{f3h}.scales_size.{lvl}.scale"] = get(
                p, f"{f3}/scale_size_l{lvl}").reshape(1)
            sd[f"{f3h}.scales_conf.{lvl}.scale"] = get(
                p, f"{f3}/scale_conf_l{lvl}").reshape(1)
            sd[f"{f3h}.scales_depth.{lvl}.scale"] = get(
                p, f"{f3}/scale_depth_l{lvl}").reshape(1)
            sd[f"{f3h}.offsets_depth.{lvl}.bias"] = get(
                p, f"{f3}/offset_depth_l{lvl}").reshape(1)
        from bevformer_tpu.models.dd3d import (
            MEAN_DEPTH_PER_LEVEL,
            STD_DEPTH_PER_LEVEL,
        )

        sd[f"{f3h}.mean_depth_per_level"] = np.asarray(
            MEAN_DEPTH_PER_LEVEL[:nl], np.float32)
        sd[f"{f3h}.std_depth_per_level"] = np.asarray(
            STD_DEPTH_PER_LEVEL[:nl], np.float32)

    return sd


def load_pth(path: str) -> Dict[str, np.ndarray]:
    """Read a PyTorch checkpoint into numpy. Prefers torch when installed;
    falls back to the pure zip/pickle reader so conversion works at deploy
    time without a torch dependency."""
    try:
        import torch
    except ImportError:
        return load_pth_notorch(path)

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    import torch as _t

    def to_np(v):
        # numpy has no bf16; upcast (same as the torch-free reader)
        return (v.float() if v.dtype == _t.bfloat16 else v).numpy()

    return {k: to_np(v) for k, v in sd.items() if hasattr(v, "numpy")}


_TORCH_NP_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "BFloat16Storage": None,  # handled via uint16 view below
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


def load_pth_notorch(path: str) -> Dict[str, np.ndarray]:
    """Torch-free reader for the PyTorch v2 zip checkpoint format.

    The archive holds `<name>/data.pkl` (a pickle whose persistent IDs
    reference per-storage files under `<name>/data/<key>`) plus the raw
    little-endian storage bytes. Tensors are rebuilt as numpy arrays via
    offset/shape/stride (`torch._utils._rebuild_tensor_v2` semantics).
    bfloat16 storages are upcast to float32 (numpy has no bf16).
    """
    import pickle
    import zipfile

    zf = zipfile.ZipFile(path)
    names = zf.namelist()
    pkl = [n for n in names if n.endswith("/data.pkl") or n == "data.pkl"]
    if not pkl:
        raise ValueError(f"{path}: not a PyTorch v2 zip checkpoint")
    prefix = pkl[0][: -len("data.pkl")]

    def load_storage(key: str, np_dtype, is_bf16: bool):
        raw = zf.read(f"{prefix}data/{key}")
        if is_bf16:
            u16 = np.frombuffer(raw, dtype=np.uint16)
            return (u16.astype(np.uint32) << 16).view(np.float32)
        return np.frombuffer(raw, dtype=np_dtype)

    class _Storage:
        def __init__(self, data):
            self.data = data

    def rebuild_tensor_v2(storage, offset, size, stride, *unused):
        arr = storage.data
        if not size:
            return arr[offset : offset + 1].reshape(()).copy()
        return np.lib.stride_tricks.as_strided(
            arr[offset:],
            shape=tuple(size),
            strides=tuple(s * arr.itemsize for s in stride),
        ).copy()

    class _Unpickler(pickle.Unpickler):
        def persistent_load(self, pid):
            # ('storage', StorageType, key, location, numel)
            assert pid[0] == "storage", pid
            stype = pid[1]
            name = getattr(stype, "__name__", str(stype))
            if name not in _TORCH_NP_DTYPES:
                raise ValueError(f"unsupported storage type {name}")
            return _Storage(
                load_storage(
                    pid[2], _TORCH_NP_DTYPES[name], name == "BFloat16Storage"
                )
            )

        def find_class(self, module, name):
            if name == "_rebuild_tensor_v2":
                return rebuild_tensor_v2
            if module.startswith("torch") and name.endswith("Storage"):
                return type(name, (), {"__name__": name})
            if (module, name) == ("collections", "OrderedDict"):
                return dict
            if name in ("_rebuild_parameter",):
                return lambda data, requires_grad, hooks: data
            raise pickle.UnpicklingError(
                f"refusing to unpickle {module}.{name} (torch-free reader "
                "only rebuilds plain tensors)"
            )

    obj = _Unpickler(zf.open(pkl[0])).load()
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v for k, v in sd.items() if isinstance(v, np.ndarray)}


def convert_pth_checkpoint(pth_path: str, cfg) -> Dict[str, Any]:
    """Load a reference .pth and return {'params': pytree} ready for apply."""
    return {"params": convert_reference_state_dict(load_pth(pth_path), cfg)}


def convert_pth_checkpoint_v2(pth_path: str, cfg) -> Dict[str, Any]:
    """Load a reference BEVFormerV2 .pth and return
    {'params': ..., 'batch_stats': ...} ready for apply."""
    return convert_reference_state_dict_v2(load_pth(pth_path), cfg)
