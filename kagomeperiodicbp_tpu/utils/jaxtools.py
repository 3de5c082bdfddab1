"""JAX runtime helpers: persistent compilation cache, platform/dtype setup."""
from __future__ import annotations

import os

_CACHE_ENABLED = False


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist XLA compiles across processes — plan programs are expensive to
    compile (~30s each on the TPU remote compiler) but fully reusable."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    import jax

    cache_dir = path or os.environ.get(
        "KPBP_JAX_CACHE", os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _CACHE_ENABLED = True
    except Exception:
        pass  # older jax — run without persistence


def setup(platform: str | None = None, x64: bool = False, cache: bool = True) -> None:
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    if x64:
        jax.config.update("jax_enable_x64", True)
    if cache:
        enable_compilation_cache()
