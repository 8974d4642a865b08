# NOTE: submodules are imported lazily (import bevformer_tpu.runtime.train
# etc. directly) — models/ imports runtime.mesh for sharding annotations, so
# an eager import of runtime.train here would be circular.
__all__ = ["mesh", "optim", "train"]
