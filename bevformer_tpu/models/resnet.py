"""ResNet backbone (flax, NHWC) with frozen BatchNorm and optional DCNv2.

Replaces the mmdet `ResNet` the reference builds from config
(`projects/configs/bevformer/bevformer_base.py:45-60`): depth 50/101,
style='pytorch' (stride-2 in the 3x3 conv), `norm_eval=True` + BN
`requires_grad=False` — i.e. BatchNorm is ALWAYS a frozen affine transform,
modeled here as `FrozenBN` constants (converted from torchvision / reference
checkpoints). DCNv2 (stages 3-4 of the R101 configs, `bevformer_base.py:
52-53`) is implemented as bilinear-gather im2col + matmul — the same
sampling primitive as the deformable attention, MXU-friendly.

Stage freezing (`frozen_stages=1`) is an optimizer concern in JAX; see
`runtime/optim.py` param masks.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ARCH_SETTINGS = {
    10: (1, 1, 1, 1),  # toy depth for tests / multi-chip dryrun
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
}


class FrozenBN(nn.Module):
    """BatchNorm with all statistics and affine params frozen (constants)."""

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        # fold into a single multiply-add (XLA fuses this into the conv)
        mul = scale * jax.lax.rsqrt(var + self.eps)
        add = bias - mean * mul
        return x * mul.astype(x.dtype) + add.astype(x.dtype)


class SyncBN(nn.Module):
    """Trainable BatchNorm (V2 backbone: `norm_eval=False`, SyncBN).

    Under jit with a dp-sharded batch, the batch-mean reduction becomes a
    cross-device collective automatically — i.e. true SyncBN semantics.
    Keeps running statistics in the 'batch_stats' collection.
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.9
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        bn = nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=self.momentum,
            epsilon=self.eps,
            dtype=self.dtype,
            name="bn",
        )
        return bn(x)


def make_norm(norm: str, features: int, dtype, name: str):
    if norm == "frozen":
        return FrozenBN(features, dtype=dtype, name=name)
    if norm == "bn":
        return SyncBN(features, dtype=dtype, name=name)
    raise ValueError(norm)


class ModulatedDeformConv(nn.Module):
    """DCNv2: 3x3 modulated deformable convolution.

    offset/mask predicted by a regular 3x3 conv (27 = 18 offsets + 9 masks),
    sampling via bilinear interpolation (zeros padding), then a dense matmul
    with the conv weight — deformable im2col, the reference's mmcv CUDA
    `DCNv2` semantics.

    Sampling strategy (TPU): impl='fp32'|'bf16' routes the deformable
    im2col through the fused Pallas window kernel
    (`kernels/dcn_pallas.py`) — the XLA gather path costs 485 ms of the
    543 ms base backbone (gather-engine bound). impl='off' keeps the exact
    bilinear-gather path (CPU tests, goldens). shift_radius>0 selects a
    gather-free masked-shift formulation kept for reference — measured
    19x SLOWER in XLA (traced-offset dynamic_slices don't fuse).
    """

    features: int
    stride: int = 1
    shift_radius: int = 0
    impl: str = "off"  # 'off' (XLA gather) | 'fp32' | 'bf16' (Pallas)
    clip_y: float = 6.0
    # sow the modulation mass whose vertical offset exceeds clip_y (the
    # fused kernel's only approximation; reference DCNv2 is unbounded)
    audit: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: [b, h, w, c]
        b, h, w, c = x.shape
        k = 3
        # bf16 fused mode runs the offset conv in bf16 (f32 MXU passes on
        # the fp32-upcast input measured 3.1 ms per stage-3 block,
        # tools/bench_dcn_probe.py offconv); offsets then carry bf16
        # rounding (~0.4% relative) consistent with the backbone's own
        # bf16 features. fp32/parity modes keep the exact fp32 conv.
        off_dt = jnp.bfloat16 if self.impl == "bf16" else jnp.float32
        om = nn.Conv(
            3 * k * k,
            (k, k),
            strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            dtype=off_dt,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="conv_offset",
        )(x.astype(off_dt)).astype(jnp.float32)
        oh, ow = om.shape[1], om.shape[2]
        # torch layout: [18 offsets (y,x interleaved per tap), 9 masks]
        offs = om[..., : 2 * k * k].reshape(b, oh, ow, k * k, 2)
        off_y, off_x = offs[..., 0], offs[..., 1]
        mask = jax.nn.sigmoid(om[..., 2 * k * k :])  # [b, oh, ow, 9]
        if self.audit and self.impl in ("fp32", "bf16"):
            over = (jnp.abs(off_y) > self.clip_y).astype(jnp.float32)
            self.sow("intermediates", "dcn_clip_mass", (mask * over).sum())
            self.sow("intermediates", "dcn_total_mass", mask.sum())

        weight = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (k * k * c, self.features),
        )

        if self.impl in ("fp32", "bf16"):
            from bevformer_tpu.kernels.dcn_pallas import dcn_conv_pallas

            cdt = jnp.float32 if self.impl == "fp32" else jnp.bfloat16
            # conv weight folded INTO the kernel: the [b, 9c, n] im2col
            # (9x the feature map) never touches HBM and the external
            # fp32 einsum it fed is gone (kernels/dcn_pallas._kernel_conv)
            out = dcn_conv_pallas(
                x.astype(cdt),
                off_y, off_x, mask, weight,
                conv_stride=self.stride, clip_y=self.clip_y,
                compute_dtype=cdt,
            )  # [b, features, oh*ow]
            out = out.transpose(0, 2, 1).reshape(b, oh, ow, self.features)
            return out.astype(self.dtype)

        if self.shift_radius > 0:
            sampled = self._sample_shift(x, off_y, off_x, mask, oh, ow)
        else:
            sampled = self._sample_gather(x, off_y, off_x, mask, oh, ow)
        out = jnp.einsum(
            "bhwi,io->bhwo",
            sampled.reshape(b, oh, ow, k * k * c),
            weight.astype(jnp.float32),
        )
        return out.astype(self.dtype)

    def _sample_shift(self, x, off_y, off_x, mask, oh, ow):
        """[b, oh, ow, 9, c] deformable samples via masked shifted copies."""
        b, h, w, c = x.shape
        k, r = 3, self.shift_radius
        eps = 1e-4
        oy = jnp.clip(off_y, -r, r - eps)
        ox = jnp.clip(off_x, -r, r - eps)
        y0 = jnp.floor(oy)
        x0 = jnp.floor(ox)
        ty = oy - y0
        tx = ox - x0
        y0 = y0.astype(jnp.int32)
        x0 = x0.astype(jnp.int32)
        w00 = mask * (1 - tx) * (1 - ty)
        w01 = mask * tx * (1 - ty)
        w10 = mask * (1 - tx) * ty
        w11 = mask * tx * ty

        pad = r + 2  # tap (+-1) + radius + right corner (+1)
        xp = jnp.pad(
            x.astype(jnp.float32), ((0, 0), (pad, pad), (pad, pad), (0, 0))
        )
        side = 2 * r + 2
        st = self.stride

        def body(s, acc):
            sy = s // side - r
            sx = s % side - r
            m = (
                w00 * ((x0 == sx) & (y0 == sy))
                + w01 * ((x0 == sx - 1) & (y0 == sy))
                + w10 * ((x0 == sx) & (y0 == sy - 1))
                + w11 * ((x0 == sx - 1) & (y0 == sy - 1))
            )  # [b, oh, ow, 9]
            contribs = []
            for ky in range(k):
                for kx in range(k):
                    src = jax.lax.dynamic_slice(
                        xp,
                        (0, pad + sy + ky - 1, pad + sx + kx - 1, 0),
                        (b, (oh - 1) * st + 1, (ow - 1) * st + 1, c),
                    )[:, ::st, ::st]
                    contribs.append(src)
            stack = jnp.stack(contribs, axis=3)  # [b, oh, ow, 9, c]
            return acc + stack * m[..., None]

        return jax.lax.fori_loop(
            0,
            side * side,
            body,
            jnp.zeros((b, oh, ow, k * k, c), jnp.float32),
        )

    def _sample_gather(self, x, off_y, off_x, mask, oh, ow):
        """Exact arbitrary-offset path (bilinear HBM gather)."""
        b, h, w, c = x.shape
        k = 3
        ys = jnp.arange(oh, dtype=jnp.float32) * self.stride - 1.0
        xs = jnp.arange(ow, dtype=jnp.float32) * self.stride - 1.0
        ky, kx = jnp.meshgrid(
            jnp.arange(k, dtype=jnp.float32),
            jnp.arange(k, dtype=jnp.float32),
            indexing="ij",
        )
        ky = ky.reshape(-1)
        kx = kx.reshape(-1)
        py = ys[None, :, None, None] + ky[None, None, None, :] + off_y
        px = xs[None, None, :, None] + kx[None, None, None, :] + off_x
        py = jnp.broadcast_to(py, (b, oh, ow, k * k))
        px = jnp.broadcast_to(px, (b, oh, ow, k * k))
        sampled = _bilinear_gather(x.astype(jnp.float32), py, px)
        return sampled * mask[..., None]


def _bilinear_gather(img, py, px):
    """img [b,h,w,c]; py/px [b,oh,ow,t] pixel coords -> [b,oh,ow,t,c]."""
    b, h, w, c = img.shape
    flat = img.reshape(b, h * w, c)

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    ty = py - y0
    tx = px - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    out = 0.0
    for dy, dx, wgt in (
        (0, 0, (1 - ty) * (1 - tx)),
        (0, 1, (1 - ty) * tx),
        (1, 0, ty * (1 - tx)),
        (1, 1, ty * tx),
    ):
        yy = y0 + dy
        xx = x0 + dx
        valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
        g = jnp.take_along_axis(
            flat[:, :, None, :],
            idx.reshape(b, -1)[:, :, None, None],
            axis=1,
        ).reshape(*idx.shape, c)
        out = out + g * (wgt * valid.astype(jnp.float32))[..., None]
    return out


class Bottleneck(nn.Module):
    planes: int  # bottleneck width; out channels = planes * 4
    stride: int = 1
    downsample: bool = False
    use_dcn: bool = False
    dcn_impl: str = "off"
    dcn_clip_y: float = 6.0
    dcn_audit: bool = False
    style: str = "pytorch"  # 'pytorch': stride in 3x3; 'caffe': stride in 1x1
    norm: str = "frozen"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ura = not train
        identity = x
        s1 = self.stride if self.style == "caffe" else 1
        s2 = 1 if self.style == "caffe" else self.stride
        out = nn.Conv(
            self.planes,
            (1, 1),
            strides=(s1, s1),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        out = make_norm(self.norm, self.planes, self.dtype, "bn1")(out, ura)
        out = nn.relu(out)

        if self.use_dcn:
            out = ModulatedDeformConv(
                self.planes, stride=s2, impl=self.dcn_impl,
                clip_y=self.dcn_clip_y, audit=self.dcn_audit,
                dtype=self.dtype, name="conv2"
            )(out)
        else:
            out = nn.Conv(
                self.planes,
                (3, 3),
                strides=(s2, s2),
                padding=[(1, 1), (1, 1)],
                use_bias=False,
                dtype=self.dtype,
                name="conv2",
            )(out)
        out = make_norm(self.norm, self.planes, self.dtype, "bn2")(out, ura)
        out = nn.relu(out)

        out = nn.Conv(
            self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(out)
        out = make_norm(self.norm, self.planes * 4, self.dtype, "bn3")(out, ura)

        if self.downsample:
            identity = nn.Conv(
                self.planes * 4,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            identity = make_norm(
                self.norm, self.planes * 4, self.dtype, "downsample_bn"
            )(identity, ura)

        return nn.relu(out + identity)


class _BlockScanBody(nn.Module):
    """Scan body for the identical (stride-1, no-downsample) tail blocks of
    a stage. Scanning instead of inlining keeps the HLO small: R101 stage 3
    alone has 22 identical blocks, and the axon compile relay rejects
    oversized programs (HTTP 413)."""

    planes: int
    use_dcn: bool
    dcn_impl: str
    dcn_clip_y: float
    dcn_audit: bool
    style: str
    norm: str
    train: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, _):
        out = Bottleneck(
            planes=self.planes,
            stride=1,
            downsample=False,
            use_dcn=self.use_dcn,
            dcn_impl=self.dcn_impl,
            dcn_clip_y=self.dcn_clip_y,
            dcn_audit=self.dcn_audit,
            style=self.style,
            norm=self.norm,
            dtype=self.dtype,
            name="block",
        )(carry, self.train)
        return out, None


class ResNet(nn.Module):
    """ResNet-50/101, NHWC, outputs the stages in `out_indices` (0-based
    stage index as in mmdet: 0->C2 .. 3->C5).

    Block 0 of each stage (strided + downsample) is a named module; the
    remaining identical blocks run under nn.scan with stacked params
    (`layer{i}_rest`), keeping program size O(stages) instead of O(blocks).
    """

    depth: int = 50
    out_indices: Tuple[int, ...] = (3,)
    dcn_stages: Tuple[int, ...] = ()  # e.g. (2, 3) for R101-DCN
    dcn_impl: str = "off"  # 'off' (XLA gather) | 'fp32' | 'bf16' (Pallas)
    dcn_clip_y: float = 6.0
    dcn_audit: bool = False
    style: str = "pytorch"
    norm: str = "frozen"  # 'frozen' (v1: norm_eval + no grad) | 'bn' (v2)
    # gradient-checkpoint each scanned block: without it the scan saves
    # every block's residuals for backward — the DCN im2col alone is
    # [n_blocks, cams, h, w, 9, C] (measured 36 GB for R101 stage 3 at
    # base resolution, an instant train-time OOM on a 16 GB chip)
    use_remat: bool = False
    # mmdet semantics: 0 freezes the stem, n>=1 also freezes stages 1..n;
    # implemented as stop_gradient at the frozen boundary — matching torch,
    # where no backward runs below it (saves the stem/stage activations:
    # 600 MB at base res) — plus the optimizer masks in runtime/optim.py
    frozen_stages: int = -1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # [b, h, w, 3]
        blocks = ARCH_SETTINGS[self.depth]
        out = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            dtype=self.dtype,
            name="stem_conv",
        )(x)
        out = make_norm(self.norm, 64, self.dtype, "stem_bn")(out, not train)
        out = nn.relu(out)
        out = nn.max_pool(
            out, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )
        if self.frozen_stages >= 0:
            out = jax.lax.stop_gradient(out)

        outputs = []
        planes = 64
        for stage, num_blocks in enumerate(blocks):
            stride = 1 if stage == 0 else 2
            use_dcn = stage in self.dcn_stages
            out = Bottleneck(
                planes=planes,
                stride=stride,
                downsample=True,
                use_dcn=use_dcn,
                dcn_impl=self.dcn_impl,
                dcn_clip_y=self.dcn_clip_y,
                dcn_audit=self.dcn_audit,
                style=self.style,
                norm=self.norm,
                dtype=self.dtype,
                name=f"layer{stage + 1}_block0",
            )(out, train)
            if num_blocks > 1:
                body = _BlockScanBody
                if self.use_remat:
                    body = nn.remat(_BlockScanBody, prevent_cse=False)
                scanned = nn.scan(
                    body,
                    variable_axes={"params": 0, "batch_stats": 0,
                                   "intermediates": 0},
                    split_rngs={"params": True},
                    length=num_blocks - 1,
                )(
                    planes=planes,
                    use_dcn=use_dcn,
                    dcn_impl=self.dcn_impl,
                    dcn_clip_y=self.dcn_clip_y,
                    dcn_audit=self.dcn_audit,
                    style=self.style,
                    norm=self.norm,
                    train=train,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_rest",
                )
                out, _ = scanned(out, None)
            if stage < self.frozen_stages:
                out = jax.lax.stop_gradient(out)
            if stage in self.out_indices:
                outputs.append(out)
            planes *= 2
        return outputs
