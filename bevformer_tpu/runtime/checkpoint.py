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
    return {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
    }


# ---------------------------------------------------------------------------
# Reference .pth conversion
# ---------------------------------------------------------------------------

def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv [O, I, kh, kw] -> flax [kh, kw, I, O]."""
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w: np.ndarray) -> np.ndarray:
    """torch linear [O, I] -> flax kernel [I, O]."""
    return np.transpose(w, (1, 0))


def convert_reference_state_dict(
    state_dict: Dict[str, np.ndarray], cfg
) -> Dict[str, Any]:
    """Map a reference BEVFormer `.pth` state_dict into our param pytree.

    Handles: ResNet backbone (+DCN), FPN, head embeddings/branches,
    PerceptionTransformer (can_bus mlp, embeds, encoder TSA/SCA, decoder).
    Returns a nested dict matching `model.init(...)['params']`.
    """
    sd = {
        k: np.asarray(v)
        for k, v in state_dict.items()
        if not k.endswith("num_batches_tracked")
    }
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
    for stage, nblocks in enumerate(blocks):
        for blk in range(nblocks):
            src = f"img_backbone.layer{stage + 1}.{blk}"
            dst = f"{bb}/layer{stage + 1}_block{blk}"
            use_dcn = stage in cfg.backbone_dcn_stages
            put(f"{dst}/conv1/kernel", _conv_kernel(sd[f"{src}.conv1.weight"]))
            if use_dcn:
                w = sd[f"{src}.conv2.weight"]  # [O, I, 3, 3]
                o, i, kh, kw = w.shape
                # ours: [tap*in + i, O] with tap = ky*3+kx
                wk = np.transpose(w, (2, 3, 1, 0)).reshape(kh * kw * i, o)
                put(f"{dst}/conv2/kernel", wk)
                put(
                    f"{dst}/conv2/conv_offset/kernel",
                    _conv_kernel(sd[f"{src}.conv2.conv_offset.weight"]),
                )
                put(
                    f"{dst}/conv2/conv_offset/bias",
                    sd[f"{src}.conv2.conv_offset.bias"],
                )
            else:
                put(
                    f"{dst}/conv2/kernel", _conv_kernel(sd[f"{src}.conv2.weight"])
                )
            put(f"{dst}/conv3/kernel", _conv_kernel(sd[f"{src}.conv3.weight"]))
            for i_bn in (1, 2, 3):
                bn(f"{dst}/bn{i_bn}", f"{src}.bn{i_bn}")
            if f"{src}.downsample.0.weight" in sd:
                put(
                    f"{dst}/downsample_conv/kernel",
                    _conv_kernel(sd[f"{src}.downsample.0.weight"]),
                )
                bn(f"{dst}/downsample_bn", f"{src}.downsample.1")

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

    # encoder layers: attentions.0 = TSA, attentions.1 = SCA
    for lid in range(cfg.encoder_layers):
        src = f"{tr}.encoder.layers.{lid}"
        dst = f"{trd}/encoder/layer{lid}"
        deform_attn(f"{dst}/self_attn", f"{src}.attentions.0")
        sca = f"{src}.attentions.1"
        deform_attn(
            f"{dst}/cross_attn/deformable_attention",
            f"{sca}.deformable_attention",
            has_out_proj=False,
        )
        put(f"{dst}/cross_attn/output_proj/kernel", _linear(sd[f"{sca}.output_proj.weight"]))
        put(f"{dst}/cross_attn/output_proj/bias", sd[f"{sca}.output_proj.bias"])
        layer_norms(dst, src)
        ffn(f"{dst}/ffn", f"{src}.ffns.0")

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

    return p


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
    for stage, nblocks in enumerate(ARCH_SETTINGS[cfg.backbone_depth]):
        for blk in range(nblocks):
            dst = f"img_backbone.layer{stage + 1}.{blk}"
            src = f"img_backbone/layer{stage + 1}_block{blk}"
            put_conv(f"{dst}.conv1", f"{src}/conv1")
            if stage in cfg.backbone_dcn_stages:
                wk = get(f"{src}/conv2/kernel")  # [9*in, out]
                o = wk.shape[1]
                i = wk.shape[0] // 9
                sd[f"{dst}.conv2.weight"] = np.transpose(
                    wk.reshape(3, 3, i, o), (3, 2, 0, 1)
                )
                put_conv(f"{dst}.conv2.conv_offset", f"{src}/conv2/conv_offset")
                sd[f"{dst}.conv2.conv_offset.bias"] = get(
                    f"{src}/conv2/conv_offset/bias"
                )
            else:
                put_conv(f"{dst}.conv2", f"{src}/conv2")
            put_conv(f"{dst}.conv3", f"{src}/conv3")
            for ib in (1, 2, 3):
                put_bn(f"{dst}.bn{ib}", f"{src}/bn{ib}")
            if "downsample_conv" in p["img_backbone"][f"layer{stage + 1}_block{blk}"]:
                put_conv(f"{dst}.downsample.0", f"{src}/downsample_conv")
                put_bn(f"{dst}.downsample.1", f"{src}/downsample_bn")

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

    for lid in range(cfg.encoder_layers):
        src = f"{trd}/encoder/layer{lid}"
        dst = f"{tr}.encoder.layers.{lid}"
        exp_deform(f"{dst}.attentions.0", f"{src}/self_attn")
        exp_deform(
            f"{dst}.attentions.1.deformable_attention",
            f"{src}/cross_attn/deformable_attention",
            has_out=False,
        )
        put_linear(f"{dst}.attentions.1.output_proj", f"{src}/cross_attn/output_proj")
        exp_norms(dst, src)
        exp_ffn(f"{dst}.ffns.0", f"{src}/ffn")

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


def load_pth(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def convert_pth_checkpoint(pth_path: str, cfg) -> Dict[str, Any]:
    """Load a reference .pth and return {'params': pytree} ready for apply."""
    return {"params": convert_reference_state_dict(load_pth(pth_path), cfg)}
