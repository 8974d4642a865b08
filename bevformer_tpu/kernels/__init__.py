from bevformer_tpu.kernels.msda import (
    ms_deform_attn,
    ms_deform_attn_banded,
    ms_deform_attn_jnp,
)

__all__ = ["ms_deform_attn", "ms_deform_attn_banded", "ms_deform_attn_jnp"]
