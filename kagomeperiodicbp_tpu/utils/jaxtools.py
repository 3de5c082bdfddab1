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

    # The experimental axon TPU backend compiles remotely; its persistent-
    # cache round trip produces executables that fail at run time with
    # UNIMPLEMENTED. Never enable the cache when axon is the platform.
    platforms = str(getattr(jax.config, "jax_platforms", "") or os.environ.get("JAX_PLATFORMS", ""))
    if "axon" in platforms:
        return

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


def to_numpy(x):
    """Device→host transfer that works around backends unable to transfer
    complex arrays (the experimental axon TPU backend): complex values move
    as two real transfers."""
    import jax.numpy as jnp
    import numpy as np

    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.complexfloating):
        return np.asarray(jnp.real(x)) + 1j * np.asarray(jnp.imag(x))
    return np.asarray(x)


def to_complex_scalar(x) -> complex:
    import jax.numpy as jnp

    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.complexfloating):
        return complex(float(jnp.real(x)), float(jnp.imag(x)))
    return complex(float(x), 0.0)


# log of programs that fell back to eager execution this process (bench and
# diagnostics read this to tag their output honestly)
EAGER_EVENTS: list = []


def _eager_fallback_enabled() -> bool:
    return os.environ.get("KPBP_EAGER_FALLBACK", "1") != "0"


def resilient_jit(fn, max_retries: int | None = None, fallback=None, **jit_kwargs):
    """jax.jit wrapper that survives the experimental axon backend's flaky
    remote compiler: the same program occasionally compiles into an
    executable that fails at run time with UNIMPLEMENTED. On such a failure
    the wrapper re-jits (forcing a fresh compile) and retries.

    The first call after each (re)compile is synchronised so the async error
    surfaces here rather than at a later transfer.

    Degraded-weather tier: when every recompile is poisoned (the backend
    sometimes rejects ALL medium-sized programs for hours while tiny ones
    run fine), the wrapper permanently switches this program to EAGER
    execution — hundreds of per-op programs small enough to escape the
    poisoning. ~100× slower than jitted, ∞× faster than nothing; each
    switch is logged and recorded in EAGER_EVENTS. Opt out with
    KPBP_EAGER_FALLBACK=0; retry budget via KPBP_JIT_RETRIES.

    `fallback`: optional callable (same signature) to use instead of plain
    eager `fn` when the program is given up on — callers pass a
    middle-granularity implementation (e.g. the per-plan-step runner,
    ops/contract.execute_plan_stepwise) so the degradation ladder composes:
    whole program → fallback's smaller programs → those programs' own
    eager fallback.
    """
    import jax

    if max_retries is None:
        max_retries = int(os.environ.get("KPBP_JIT_RETRIES", "4"))
    state = {"jitted": jax.jit(fn, **jit_kwargs), "validated": False,
             "eager": False}

    def _probe(out):
        """Actually transfer the smallest output leaf: poisoned executables
        can pass block_until_ready yet produce buffers that fail any
        device→host copy (and poison everything computed from them)."""
        leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "dtype")]
        if leaves:
            to_numpy(min(leaves, key=lambda l: l.size))

    degraded = fallback if fallback is not None else fn

    def call(*args, **kwargs):
        if state["eager"]:
            return degraded(*args, **kwargs)
        attempt = 0
        while True:
            try:
                out = state["jitted"](*args, **kwargs)
                if not state["validated"]:
                    jax.block_until_ready(out)
                    _probe(out)
                    state["validated"] = True
                return out
            except Exception as exc:  # noqa: BLE001
                if "UNIMPLEMENTED" not in str(exc):
                    raise
                if attempt >= max_retries:
                    if not _eager_fallback_enabled():
                        raise
                    import logging

                    name = getattr(fn, "__qualname__", repr(fn))
                    how = "FALLBACK" if fallback is not None else "EAGER"
                    logging.getLogger("kpbp.jaxtools").warning(
                        "resilient_jit: %d poisoned compiles for %s — "
                        "switching this program to %s execution",
                        attempt + 1, name, how)
                    EAGER_EVENTS.append(name)
                    state["eager"] = True
                    return degraded(*args, **kwargs)
                attempt += 1
                # new function identity → fresh compilation-cache entry
                fresh = lambda *a, **k: fn(*a, **k)  # noqa: E731
                state["jitted"] = jax.jit(fresh, **jit_kwargs)
                state["validated"] = False

    call._state = state  # introspection: tests assert _cache_size() == 1
    return call
