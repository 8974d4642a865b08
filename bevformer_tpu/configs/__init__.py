from bevformer_tpu.configs.config import (
    BEVFormerConfig,
    DataConfig,
    OptimConfig,
    get_config,
    register_config,
    CONFIGS,
)

__all__ = [
    "BEVFormerConfig",
    "DataConfig",
    "OptimConfig",
    "get_config",
    "register_config",
    "CONFIGS",
]
