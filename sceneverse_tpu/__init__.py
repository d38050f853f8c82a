"""sceneverse_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for grounded
3D vision-language learning, providing the full capability surface of the
SceneVerse/GPS reference stack (three-tower GPS model, 7 indoor-scene dataset
families, grounding/QA evaluators, contrastive+masked-LM pretraining) rebuilt
TPU-first.

Design stance (vs. the CUDA/torch reference at scene-verse/SceneVerse):
  * static shapes everywhere -> the whole model is jit-compilable
  * PointNet++ native CUDA ops -> fused XLA/Pallas point ops (sceneverse_tpu.ops)
  * DDP/NCCL -> a jax.sharding Mesh; XLA inserts collectives from shardings
  * per-item Python data plumbing -> vectorized numpy/JAX batch builders
"""

__version__ = "0.1.0"
