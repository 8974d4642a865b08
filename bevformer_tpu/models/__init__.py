from bevformer_tpu.models.detector import BEVFormer

__all__ = ["BEVFormer"]
