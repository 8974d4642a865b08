from bevformer_tpu.core import boxes, geometry

__all__ = ["boxes", "geometry"]
