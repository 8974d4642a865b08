"""Eval-time conv+BN fusion (reference: `tools/misc/fuse_conv_bn.py`).

Folds every BatchNorm that directly follows a conv into the conv kernel,
leaving the BN an exact identity: with `mul = scale * rsqrt(var + eps)`,

    kernel' = kernel * mul          (per output channel)
    bn'     = {scale=1, bias=bias - mean*mul, mean=0, var=1-eps}

so `BN'(conv'(x)) == BN(conv(x))` with BN' a pure per-channel `+bias`.
Matters for V2, whose backbone BN *trains* (`norm_eval=False`,
`bevformerv2-r50-t1-24ep.py:177-179`) — v1's FrozenBN folds at compile
time anyway. On TPU the remaining affine fuses into the conv epilogue
under XLA, so this is numerics/portability parity with the reference
tool, not a kernel count change; the win is dropping the `batch_stats`
collection from the serving bundle (the returned tree keeps it only as
identity constants).

Handled pairs (the repo's whole conv->BN inventory): resnet.py
(conv1/bn1, conv2/bn2, conv3/bn3, downsample_conv/downsample_bn,
stem_conv/stem_bn) and vovnet.py ConvNorm (conv/bn). Works on
`nn.scan`-stacked block params (leading stack axes broadcast through).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

BN_EPS = 1e-5

_PAIRS = (
    ("conv1", "bn1"),
    ("conv2", "bn2"),
    ("conv3", "bn3"),
    ("downsample_conv", "downsample_bn"),
    ("stem_conv", "stem_bn"),
    ("conv", "bn"),
)


def _is_conv(node) -> bool:
    return isinstance(node, dict) and "kernel" in node and not isinstance(
        node["kernel"], dict
    )


def _bcast(vec, kernel):
    """[..., C] channel vector -> broadcastable against kernel [..., C]
    (stacked leading axes preserved, middle axes newaxis'd)."""
    extra = kernel.ndim - vec.ndim
    return vec.reshape(vec.shape[:-1] + (1,) * extra + (vec.shape[-1],))


def _fold(conv: dict, bn_p: dict, bn_s: dict | None, eps: float):
    """Return (conv', bn_params', bn_stats') with the BN folded in."""
    if bn_s is None:  # FrozenBN: stats live in params
        scale, bias = bn_p["scale"], bn_p["bias"]
        mean, var = bn_p["mean"], bn_p["var"]
    else:  # SyncBN: nn.BatchNorm under 'bn'
        scale, bias = bn_p["scale"], bn_p["bias"]
        mean, var = bn_s["mean"], bn_s["var"]
    mul = scale / jnp.sqrt(var + eps)
    kernel = conv["kernel"]
    new_conv = dict(conv)
    new_conv["kernel"] = (kernel * _bcast(mul, kernel)).astype(kernel.dtype)
    if "bias" in conv and not isinstance(conv["bias"], dict):
        fused_bias = bias + (conv["bias"] - mean) * mul
        new_conv["bias"] = jnp.zeros_like(conv["bias"])
    else:
        fused_bias = bias - mean * mul
    new_bn_p = dict(bn_p)
    new_bn_p["scale"] = jnp.ones_like(scale)
    new_bn_p["bias"] = fused_bias.astype(bias.dtype)
    ident_mean = jnp.zeros_like(mean)
    ident_var = jnp.full_like(var, 1.0 - eps)
    new_bn_s = None
    if bn_s is None:
        new_bn_p["mean"] = ident_mean
        new_bn_p["var"] = ident_var
    else:
        new_bn_s = dict(bn_s)
        new_bn_s["mean"] = ident_mean
        new_bn_s["var"] = ident_var
    return new_conv, new_bn_p, new_bn_s


def _walk(params: dict, stats: dict | None, eps: float) -> Tuple[dict, dict]:
    out_p: Dict[str, Any] = {}
    out_s: Dict[str, Any] = {} if stats is not None else None
    for key, node in params.items():
        if isinstance(node, dict) and not _is_conv(node):
            sub_s = stats.get(key) if stats else None
            p2, s2 = _walk(node, sub_s, eps)
            out_p[key] = p2
            if out_s is not None and sub_s is not None:
                out_s[key] = s2
        else:
            out_p[key] = node
    for ck, bk in _PAIRS:
        conv = out_p.get(ck)
        bn = out_p.get(bk)
        if not (_is_conv(conv) and isinstance(bn, dict)):
            continue
        if "bn" in bn:  # SyncBN wrapper: affine under 'bn', stats aside
            bn_stats = (stats or {}).get(bk, {}).get("bn")
            if bn_stats is None:
                continue
            c2, p2, s2 = _fold(conv, bn["bn"], bn_stats, eps)
            out_p[ck] = c2
            out_p[bk] = dict(bn, bn=p2)
            out_s[bk] = dict(out_s.get(bk, {}), bn=s2)
        elif {"scale", "bias", "mean", "var"} <= set(bn.keys()):
            c2, p2, _ = _fold(conv, bn, None, eps)
            out_p[ck] = c2
            out_p[bk] = p2
    if out_s is not None and stats is not None:
        for key, node in stats.items():
            out_s.setdefault(key, node)
    return out_p, out_s


def fuse_conv_bn(variables: dict, eps: float = BN_EPS) -> dict:
    """Fuse conv+BN pairs across a flax variables dict
    ({'params': ..., 'batch_stats': ...}); returns a new variables dict
    producing bitwise-equivalent eval outputs up to float rounding."""
    params = variables["params"]
    stats = variables.get("batch_stats")
    new_p, new_s = _walk(params, stats, eps)
    out = dict(variables)
    out["params"] = new_p
    if stats is not None:
        out["batch_stats"] = new_s
    return out
