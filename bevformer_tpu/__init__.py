"""bevformer-tpu: a TPU-native (JAX/XLA/Pallas) multi-camera 3D detection framework.

Re-implements the complete capability surface of fundamentalvision/BEVFormer
(see SURVEY.md) as an idiomatic JAX framework: static shapes, functional
modules, pjit/shard_map data parallelism over TPU meshes, and a fused Pallas
multi-scale deformable attention kernel replacing the reference's CUDA op.
"""

__version__ = "0.1.0"

from bevformer_tpu import core, kernels

__all__ = ["core", "kernels", "__version__"]
