from bevformer_tpu.models.detector import BEVFormer
from bevformer_tpu.models.bev_head import BEVHead

__all__ = ["BEVFormer", "BEVHead"]
