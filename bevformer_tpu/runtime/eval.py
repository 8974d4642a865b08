"""Stateful video inference loop (functional prev-BEV state).

Equivalent of `BEVFormer.forward_test` + `custom_multi_gpu_test`
(`detectors/bevformer.py:236-269`, `bevformer/apis/test.py:45-160`): one
compiled step serves every frame; the scene-boundary reset and the
ego-motion delta bookkeeping are explicit host-side state. Multi-host eval
shards the dataset into contiguous video segments per process (the
reference's custom DistributedSampler, `datasets/samplers/
distributed_sampler.py:22-41`) and gathers results at the end.
"""

from __future__ import annotations

import copy
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bevformer_tpu.configs import BEVFormerConfig
from bevformer_tpu.core import coder
from bevformer_tpu.models import BEVFormer


def collect_fused_audit(intermediates):
    """Reduce the sown fused-path audit scalars to (drop_mass, total_mass,
    capacity_clipped) jnp scalars (usable inside jit)."""
    drop = jnp.float32(0.0)
    total = jnp.float32(0.0)
    clipped = jnp.int32(0)
    for path, leaf in jax.tree_util.tree_flatten_with_path(intermediates)[0]:
        name = str(path[-2].key)
        if name in ("msda_drop_mass", "dcn_clip_mass"):
            drop = drop + jnp.sum(leaf)
        elif name in ("msda_total_mass", "dcn_total_mass"):
            total = total + jnp.sum(leaf)
        elif name == "sca_capacity_clipped":
            clipped = clipped + jnp.sum(leaf)
    return drop, total, clipped


class VideoEvaluator:
    """`audit_interval` > 0 runs the fused-path exactness audits (window
    drop mass + SCA capacity clipping, sown as intermediates) on the first
    frame and then every `audit_interval` frames; `fused_guard=True`
    additionally auto-widens the fused halos / capacity and recompiles when
    the first-frame audit reports loss, so converted checkpoints whose
    learned offsets exceed the shipped windows can never silently lose
    attention mass (the reference CUDA kernel is unconditionally exact,
    `multi_scale_deformable_attn_function.py:15-124`)."""

    def __init__(self, model: BEVFormer, params, max_num: Optional[int] = None,
                 audit_interval: int = 0, fused_guard: bool = False,
                 drop_tol: float = 1e-6):
        self.model = model
        self.params = params
        self.cfg = model.cfg
        self.max_num = max_num or model.cfg.max_num
        self.audit_interval = audit_interval
        self.fused_guard = fused_guard
        self.drop_tol = drop_tol
        self.audit_log: List[Dict] = []
        self._frame_i = 0
        self._build()
        self.reset()

    def _build(self):
        model, params, c = self.model, self.params, self.cfg

        def step(images, can_bus, lidar2img, prev_bev, has_prev):
            preds = model.apply(
                params, images, can_bus, lidar2img, prev_bev, has_prev
            )
            dec = coder.decode_batch(
                preds,
                max_num=self.max_num,
                num_classes=c.num_classes,
                post_center_range=c.post_center_range,
            )
            return preds["bev_embed"], dec

        self._step = jax.jit(step)
        self._audit_step = None
        if self.audit_interval or self.fused_guard:
            import dataclasses

            audit_model = BEVFormer(
                cfg=dataclasses.replace(c, fused_audit=True)
            )

            def audit_step(images, can_bus, lidar2img, prev_bev, has_prev):
                _, mut = audit_model.apply(
                    params, images, can_bus, lidar2img, prev_bev, has_prev,
                    mutable=["intermediates"],
                )
                return collect_fused_audit(mut["intermediates"])

            self._audit_step = jax.jit(audit_step)

    def audit_frame(self, images, can_bus, lidar2img) -> Dict:
        """Run the exactness audits on one (preprocessed) frame."""
        drop, total, clipped = self._audit_step(
            images, can_bus, lidar2img, self._prev_bev,
            jnp.asarray([self._has_prev]),
        )
        rec = {
            "frame": self._frame_i,
            "drop_mass": float(drop),
            "total_mass": float(total),
            "drop_frac": float(drop) / max(float(total), 1.0),
            "capacity_clipped": int(clipped),
            "sca_halo": self.cfg.sca_fused_halo,
            "tsa_halo": self.cfg.tsa_fused_halo,
            "dec_halo": self.cfg.dec_fused_halo,
            "capacity_ratio": self.cfg.sca_capacity_ratio,
        }
        self.audit_log.append(rec)
        return rec

    def _guard_frame(self, images, can_bus, lidar2img):
        """First-frame guard: widen halos / capacity until the audit is
        clean (each widening recompiles; bounded retries)."""
        import dataclasses

        for attempt in range(5):
            rec = self.audit_frame(images, can_bus, lidar2img)
            bad_drop = rec["drop_frac"] > self.drop_tol
            bad_cap = rec["capacity_clipped"] > 0
            if not (bad_drop or bad_cap):
                return
            c = self.cfg
            updates = {}
            if bad_drop:
                # the drop scalar folds every fused approximation (msda
                # windows + DCN vertical clip); widen all of them — over-
                # widening only costs speed, never accuracy. First attempt
                # is FINE (+2: borderline geometry — e.g. a checkpoint
                # whose offsets sit one row past the halo — shouldn't pay
                # an 8-row window tax forever); later attempts DOUBLE
                # (8, 16, 32, 64 rows): a linear step can stall under the
                # retry bound when offsets are far past the halo (a
                # ±12-row spread already needs wrows ≈ 38 at cap_tile=512
                # on a 50-wide BEV)
                step = (2, 8, 16, 32, 64)[attempt]

                def _widened(cur, default, s):
                    # per-head tuples widen element-wise (the audit drop
                    # scalar doesn't attribute mass to heads; widening
                    # every head is safe, only slower)
                    if cur is None:
                        cur = default
                    if isinstance(cur, (tuple, list)):
                        return tuple(int(x) + s for x in cur)
                    return cur + s

                from bevformer_tpu.models import attention as _attn

                tsa_default = _attn.TemporalSelfAttention.fused_halo
                if isinstance(tsa_default, str):  # "auto"
                    tsa_default = _attn.grid_msda_default_halos(
                        c.num_heads, 4,
                        _attn.TemporalSelfAttention.fused_cap_tile,
                        c.bev_w,
                        _attn.TemporalSelfAttention.fused_stride,
                    )
                updates.update(
                    sca_fused_halo=_widened(
                        c.sca_fused_halo,
                        _attn.MSDeformableAttention3D.fused_halo, step),
                    tsa_fused_halo=_widened(
                        c.tsa_fused_halo, tsa_default, step),
                    dec_fused_halo=_widened(
                        c.dec_fused_halo,
                        _attn.CustomMSDeformableAttention.fused_halo,
                        2 * step),
                    dcn_clip_y=c.dcn_clip_y + 3.0 * (1 << attempt),
                )
            if bad_cap:
                updates.update(
                    sca_capacity_ratio=min(
                        c.sca_capacity_ratio + 0.1, 1.0
                    )
                )
            print(
                f"[fused-guard] audit failed ({rec}); widening {updates}",
                flush=True,
            )
            self.cfg = dataclasses.replace(c, **updates)
            self.model = BEVFormer(cfg=self.cfg)
            self._build()
        raise RuntimeError(
            f"fused-path guard could not reach exactness: {self.audit_log[-1]}"
        )

    def reset(self):
        c = self.cfg
        self._prev_bev = jnp.zeros(
            (1, c.bev_h * c.bev_w, c.embed_dims), jnp.float32
        )
        self._scene_token = None
        self._prev_pos = None
        self._prev_angle = None
        self._has_prev = False

    def infer_frame(self, sample: Dict) -> Dict[str, np.ndarray]:
        """sample: images [cams,H,W,3], can_bus [18] (absolute pose packing),
        lidar2img [cams,4,4], scene_token, token."""
        c = self.cfg
        if sample["scene_token"] != self._scene_token:
            self._has_prev = False
        self._scene_token = sample["scene_token"]
        if not c.video_test_mode:
            self._has_prev = False

        can_bus = np.array(sample["can_bus"], np.float64).copy()
        tmp_pos = can_bus[:3].copy()
        tmp_angle = float(can_bus[-1])
        if self._has_prev:
            can_bus[:3] -= self._prev_pos
            can_bus[-1] -= self._prev_angle
        else:
            can_bus[:3] = 0
            can_bus[-1] = 0

        images = jnp.asarray(sample["images"], jnp.float32)[None]
        can = jnp.asarray(can_bus, jnp.float32)[None]
        l2i = jnp.asarray(sample["lidar2img"], jnp.float32)[None]
        first = self._frame_i == 0
        periodic = self.audit_interval and (
            self._frame_i % self.audit_interval == 0
        )
        if (first and self.fused_guard) or periodic:
            if first and self.fused_guard:
                self._guard_frame(images, can, l2i)
            else:
                rec = self.audit_frame(images, can, l2i)
                if (
                    rec["drop_frac"] > self.drop_tol
                    or rec["capacity_clipped"] > 0
                ):
                    # ACT, don't just log: offsets can drift past the halo
                    # only after real history accumulates (frame > 0), so a
                    # mid-run failure auto-widens + recompiles exactly like
                    # frame 0. Without the guard, fail loudly: a warning
                    # that scrolls by is not an exactness guarantee.
                    if self.fused_guard:
                        print(
                            f"[fused-audit] mid-run exactness loss ({rec}); "
                            "auto-widening",
                            flush=True,
                        )
                        self._guard_frame(images, can, l2i)
                    else:
                        raise RuntimeError(
                            "[fused-audit] fused path lost attention mass "
                            f"mid-run with the guard disabled: {rec}. "
                            "Re-run without --no-fused-guard, or with "
                            "--parity for the exact XLA path."
                        )
        self._frame_i += 1
        bev, dec = self._step(
            images,
            can,
            l2i,
            self._prev_bev,
            jnp.asarray([self._has_prev]),
        )
        self._prev_bev = bev.astype(jnp.float32)
        self._prev_pos = tmp_pos
        self._prev_angle = tmp_angle
        self._has_prev = True

        boxes = np.asarray(dec["bboxes"][0])
        valid = np.asarray(dec["valid"][0])
        # gravity-center z -> bottom z for the LiDAR box convention
        # (`bevformer_head.py:500`)
        boxes = boxes.copy()
        boxes[:, 2] -= 0.5 * boxes[:, 5]
        return {
            "token": sample["token"],
            "boxes_3d": boxes[valid],
            "scores_3d": np.asarray(dec["scores"][0])[valid],
            "labels_3d": np.asarray(dec["labels"][0])[valid],
        }

    def run(self, dataset, indices=None, progress_every: int = 50) -> List[Dict]:
        results = []
        n = len(dataset)
        idxs = indices if indices is not None else range(n)
        for i in idxs:
            sample = dataset.get_test_sample(i)
            results.append(self.infer_frame(sample))
            if progress_every and (len(results) % progress_every == 0):
                print(f"eval {len(results)} frames", flush=True)
        return results


class VideoEvaluatorV2:
    """BEVFormerV2 test loop — `forward_test`/`simple_test` equivalent
    (`detectors/bevformerV2.py:226-266`).

    Unlike v1's video mode there is NO cross-sample state: every sample
    re-encodes its own history frames with the current weights via
    `obtain_history_bev` (`bevformerV2.py:164-183` — eval mode, no grad),
    then runs the current frame through the full head with the
    frames-keyed `prev_bev_list`. One jitted step covers both. Invalid
    history frames are padded with the current frame's data at the data
    layer (`data/dataset_v2.py::get_test_sample_v2`), matching the
    reference pipeline's scene-boundary fill."""

    def __init__(self, model, variables, max_num: Optional[int] = None):
        self.model = model
        # {'params': ..., 'batch_stats': ...} (V2 backbones use BN)
        self.variables = variables
        c = model.cfg
        self.cfg = c
        self.max_num = max_num or c.max_num
        cur = list(c.frames).index(0)

        def step(variables, images, lidar2img, flip, bda_mat):
            # images [1, T, cams, H, W, 3]; T = len(cfg.frames)
            prev_list = []
            for i, off in enumerate(c.frames):
                if off == 0:
                    prev_list.append(None)
                    continue
                bev = model.apply(
                    variables, images[:, i], lidar2img[:, i], flip, bda_mat,
                    method="bev_only",
                )
                prev_list.append(bev)
            preds = model.apply(
                variables, images[:, cur], lidar2img[:, cur],
                prev_bev_list=prev_list, flip=flip, bda_mat=bda_mat,
            )
            dec = coder.decode_batch(
                preds,
                max_num=self.max_num,
                num_classes=c.num_classes,
                post_center_range=c.post_center_range,
            )
            return dec

        # params as jit ARGUMENTS: closed-over param pytrees are baked into
        # the HLO as constants and overflow the axon compile relay
        self._step = jax.jit(step)

    def infer_sample(self, sample: Dict) -> Dict[str, np.ndarray]:
        images = jnp.asarray(sample["images"], jnp.float32)[None]
        l2i = jnp.asarray(sample["lidar2img"], jnp.float32)[None]
        flip = jnp.asarray([bool(sample.get("flip", False))])
        bda = jnp.asarray(
            sample.get("bda_mat", np.eye(2, dtype=np.float32)), jnp.float32
        )[None]
        dec = self._step(self.variables, images, l2i, flip, bda)
        boxes = np.asarray(dec["bboxes"][0]).copy()
        valid = np.asarray(dec["valid"][0])
        # gravity-center z -> bottom z (`bevformer_head.py:500`)
        boxes[:, 2] -= 0.5 * boxes[:, 5]
        return {
            "token": sample["token"],
            "boxes_3d": boxes[valid],
            "scores_3d": np.asarray(dec["scores"][0])[valid],
            "labels_3d": np.asarray(dec["labels"][0])[valid],
        }

    def run(self, dataset, indices=None, progress_every: int = 50) -> List[Dict]:
        results = []
        idxs = indices if indices is not None else range(len(dataset))
        for i in idxs:
            results.append(self.infer_sample(dataset.get_test_sample_v2(i)))
            if progress_every and (len(results) % progress_every == 0):
                print(f"eval {len(results)} samples", flush=True)
        return results
