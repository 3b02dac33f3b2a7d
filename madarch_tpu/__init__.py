"""madarch_tpu — a TPU-native differentiable sphere-tracing renderer.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Roldak/Madarch
(real-time ray marching with DDGI global illumination, PBR materials, soft
shadows, ambient occlusion, volumetric lighting, triangle meshes with spatial
partitioning), redesigned for TPU hardware: batched masked ray-march loops,
struct-of-arrays scenes with static shapes, autodiff end-to-end, and SPMD
scaling over device meshes.
"""

__version__ = "0.1.0"
