from bevformer_tpu.utils.profiler import run_time
from bevformer_tpu.utils.visual import save_tensor

__all__ = ["run_time", "save_tensor"]
