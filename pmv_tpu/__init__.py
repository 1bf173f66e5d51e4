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

import os as _os


def _enable_persistent_compile_cache():
    """Point JAX's persistent compilation cache at <repo>/.jaxcache.

    This environment pre-imports jax at interpreter startup (the TPU
    plugin's .pth hook), so the JAX_COMPILATION_CACHE_DIR env var set by
    entry scripts is read too late and silently ignored; the runtime
    config update is the only path that works. An explicitly set env var
    still wins. Idempotent and safe on CPU (caches those compiles too).
    """
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return
        path = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(
                _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                ".jaxcache",
            ),
        )
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:  # pragma: no cover - cache is an optimization only
        pass


_enable_persistent_compile_cache()
