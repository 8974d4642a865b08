from bevformer_tpu.data.dataset import NuScenesTemporalDataset
from bevformer_tpu.data.pipeline import preprocess_images

__all__ = ["NuScenesTemporalDataset", "preprocess_images"]
