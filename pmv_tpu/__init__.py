"""pmv_tpu: a TPU-native (JAX/XLA/Pallas/pjit) video-recognition framework.

Provides the capabilities of ByteDance's Portrait-Mode-Video release (the
PMV-400 portrait-video recognition stack built on PySlowFast): portrait-aware
data pipeline, X3D / UniFormer / MViT / SlowFast model families, the full
SlowFast-style train/eval engine, and multi-view test ensembling — redesigned
TPU-first around a single-controller JAX runtime, `jax.sharding` data
parallelism, and Pallas kernels for the hot attention ops.

Reference (structure/behavior only, no code): /root/reference
"""

__version__ = "0.1.0"
