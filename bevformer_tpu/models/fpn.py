"""FPN neck (mmdet semantics) in flax, NHWC.

Matches the config surface used by the reference
(`bevformer_base.py:61-70`): lateral 1x1 convs, nearest top-down upsample,
3x3 output convs, `add_extra_convs='on_output'` with
`relu_before_extra_convs=True`, no norm, bias=True.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FPN(nn.Module):
    in_channels: Tuple[int, ...]
    out_channels: int = 256
    num_outs: int = 4
    start_level: int = 0
    add_extra_convs: str = "on_output"
    relu_before_extra_convs: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]):
        assert len(inputs) == len(self.in_channels)
        used = len(self.in_channels) - self.start_level

        laterals = [
            nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name=f"lateral{i}"
            )(inputs[i + self.start_level])
            for i in range(used)
        ]

        # top-down pathway, nearest upsampling
        for i in range(used - 1, 0, -1):
            target = laterals[i - 1].shape[1:3]
            up = jax.image.resize(
                laterals[i],
                laterals[i].shape[:1] + target + laterals[i].shape[3:],
                method="nearest",
            )
            laterals[i - 1] = laterals[i - 1] + up

        outs = [
            nn.Conv(
                self.out_channels,
                (3, 3),
                padding=[(1, 1), (1, 1)],
                dtype=self.dtype,
                name=f"fpn{i}",
            )(laterals[i])
            for i in range(used)
        ]

        # extra levels from stride-2 convs on the last output
        if self.num_outs > used:
            assert self.add_extra_convs == "on_output"
            src = outs[-1]
            for i in range(used, self.num_outs):
                if i > used and self.relu_before_extra_convs:
                    src = nn.relu(src)
                src = nn.Conv(
                    self.out_channels,
                    (3, 3),
                    strides=(2, 2),
                    padding=[(1, 1), (1, 1)],
                    dtype=self.dtype,
                    name=f"fpn{i}",
                )(src)
                outs.append(src)
        return outs
