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


class VideoEvaluator:
    def __init__(self, model: BEVFormer, params, max_num: Optional[int] = None):
        self.model = model
        self.params = params
        self.cfg = model.cfg
        c = self.cfg
        self.max_num = max_num or c.max_num

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
        self.reset()

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

        bev, dec = self._step(
            jnp.asarray(sample["images"], jnp.float32)[None],
            jnp.asarray(can_bus, jnp.float32)[None],
            jnp.asarray(sample["lidar2img"], jnp.float32)[None],
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
