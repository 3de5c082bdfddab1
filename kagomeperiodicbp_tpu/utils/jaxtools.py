"""JAX runtime helpers: persistent compilation cache, platform/dtype setup."""
from __future__ import annotations

import os

_CACHE_ENABLED = False


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist XLA compiles across processes. OPT-IN via KPBP_JAX_CACHE=<dir>.

    Measured unusable on both backends of this machine (round 5):

    * axon: the remote compiler's persistent-cache round trip produces
      executables that fail at run time with UNIMPLEMENTED;
    * XLA:CPU (jax 0.9.0): serialized AOT executables embed pseudo-features
      (``+prefer-no-scatter``/``+prefer-no-gather``) in the compile-machine
      feature list that the loader's host-feature list never contains, so
      every cross-process load fails the machine-match check
      (cpu_aot_loader.cc "could lead to execution errors such as SIGILL")
      and falls back to a recompile — pure overhead plus SIGILL risk.
    """
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    import jax

    if not os.environ.get("KPBP_JAX_CACHE"):
        return
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


class TransferTimeout(RuntimeError):
    """A device→host copy (or ready-wait) hung.

    Observed axon failure mode (round 3): poisoned executables can produce
    buffers whose transfer RPC blocks forever *in C code* — SIGALRM never
    fires because the Python signal handler can't run while the calling
    thread is stuck inside the runtime. The only in-process guard that works
    is doing the blocking call in a separate thread and abandoning it on
    timeout. Treated everywhere as a poisoned-program signal (same class as
    runtime UNIMPLEMENTED)."""


_ON_AXON: dict = {}  # keyed by the platform-config tuple (ADVICE r3: a later
# jax.config.update("jax_platforms", ...) must not leave hang guards stuck in
# the previous mode)


def on_axon() -> bool:
    """True when the experimental axon TPU backend is active. The devices
    report platform 'tpu' (not 'axon') — the config/env string is the only
    reliable signal."""
    import jax

    key = (getattr(jax.config, "jax_platforms", "") or "",
           os.environ.get("JAX_PLATFORMS", ""))
    if key not in _ON_AXON:
        if "axon" not in "%s,%s" % key:
            _ON_AXON[key] = False
        else:
            try:
                _ON_AXON[key] = jax.devices()[0].platform in ("axon", "tpu")
            except Exception:
                return False  # backend not up yet — don't cache
    return _ON_AXON[key]


def guarded_wait(fn, timeout: float | None = None):
    """Run a potentially-hanging blocking call (device→host copy,
    block_until_ready) in a daemon thread with a deadline. Only engaged on
    axon — on healthy backends this is a plain call with zero overhead.

    On timeout the worker thread is abandoned (daemon — it dies with the
    process) and TransferTimeout is raised so resilient_jit / callers treat
    the program as poisoned instead of hanging past every tool watchdog."""
    if not on_axon():
        return fn()
    import threading

    if timeout is None:
        timeout = float(os.environ.get("KPBP_TRANSFER_TIMEOUT", "180"))
    box: dict = {}

    def run():
        try:
            box["v"] = fn()
        except BaseException as exc:  # noqa: BLE001 — relayed to caller
            box["e"] = exc

    t = threading.Thread(target=run, daemon=True, name="kpbp-transfer")
    t.start()
    t.join(timeout)
    if t.is_alive():
        raise TransferTimeout(
            f"device→host wait exceeded {timeout:.0f}s (hung runtime RPC — "
            "treating the producing program as poisoned)")
    if "e" in box:
        raise box["e"]
    return box.get("v")


def _poisoned(exc: BaseException) -> bool:
    """Does this exception mean 'the compiled executable is bad' (retryable
    with a fresh compile) rather than a genuine program error?"""
    return isinstance(exc, TransferTimeout) or "UNIMPLEMENTED" in str(exc)


def to_numpy(x):
    """Device→host transfer that works around backends unable to transfer
    complex arrays (the experimental axon TPU backend): complex values move
    as two real transfers. On axon the copy is hang-guarded (see
    guarded_wait)."""
    import jax.numpy as jnp
    import numpy as np

    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.complexfloating):
        re, im = jnp.real(x), jnp.imag(x)
        return guarded_wait(lambda: np.asarray(re) + 1j * np.asarray(im))
    return guarded_wait(lambda: np.asarray(x))


def host_float(x) -> float:
    """Hang-guarded scalar transfer (use instead of float(arr) in drivers)."""
    import numpy as np

    return float(np.asarray(to_numpy(x)).reshape(())) if hasattr(x, "dtype") else float(x)


def to_complex_scalar(x) -> complex:
    import jax.numpy as jnp

    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.complexfloating):
        return complex(host_float(jnp.real(x)), host_float(jnp.imag(x)))
    return complex(host_float(x), 0.0)


# log of programs that fell back to eager execution this process (bench and
# diagnostics read this to tag their output honestly)
EAGER_EVENTS: list = []

# bumped whenever any wrapper calls jax.clear_caches(); wrappers re-validate
# (probe a real device→host transfer) when their stored generation is stale
_CACHE_GENERATION: int = 0


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
    # KPBP_FORCE_EAGER=1: start every program at the degraded tier without
    # paying a poisoned compile attempt first.  Used by bench.py when the
    # jit probe fails but eager device ops still work (EAGER_TRANSFER
    # weather) — converts a would-be stale round into a fresh chip datum.
    force_eager = os.environ.get("KPBP_FORCE_EAGER") == "1"
    state = {"jitted": None if force_eager else jax.jit(fn, **jit_kwargs),
             "validated": False, "eager": force_eager}
    if force_eager:
        EAGER_EVENTS.append(getattr(fn, "__qualname__", repr(fn)) + " (forced)")

    def _probe(out):
        """Actually transfer the smallest output leaf: poisoned executables
        can pass block_until_ready yet produce buffers that fail any
        device→host copy (and poison everything computed from them)."""
        leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "dtype")]
        if leaves:
            to_numpy(min(leaves, key=lambda l: l.size))

    degraded = fallback if fallback is not None else fn

    def _run_degraded(*args, **kwargs):
        """Last-tier execution with poisoned-per-op recovery: eager op
        executables are compiled+cached too, and the flaky axon compiler
        occasionally poisons those as well (observed: a full eager BP sweep
        dies on one op's UNIMPLEMENTED while the other hundreds run).
        jax.clear_caches() evicts the poisoned executable so the retry gets
        a fresh compile. Budget via KPBP_EAGER_RETRIES."""
        retries = int(os.environ.get("KPBP_EAGER_RETRIES", "2"))
        attempt = 0
        while True:
            try:
                return degraded(*args, **kwargs)
            except Exception as exc:  # noqa: BLE001
                if not _poisoned(exc) or attempt >= retries:
                    raise
                attempt += 1
                import logging

                logging.getLogger("kpbp.jaxtools").warning(
                    "degraded execution hit a poisoned per-op executable "
                    "(%s) — jax.clear_caches() and retry %d/%d",
                    repr(exc)[:90], attempt, retries)
                jax.clear_caches()
                # every other resilient_jit wrapper's validated executable
                # was just evicted too; bump the generation so each re-probes
                # its fresh recompile on next use (ADVICE r3)
                global _CACHE_GENERATION
                _CACHE_GENERATION += 1

    def call(*args, **kwargs):
        if state["eager"]:
            return _run_degraded(*args, **kwargs)
        attempt = 0
        while True:
            try:
                out = state["jitted"](*args, **kwargs)
                if not state["validated"] or state.get("generation") != _CACHE_GENERATION:
                    guarded_wait(lambda: jax.block_until_ready(out))
                    _probe(out)
                    state["validated"] = True
                    state["generation"] = _CACHE_GENERATION
                return out
            except Exception as exc:  # noqa: BLE001
                if not _poisoned(exc):
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
                    return _run_degraded(*args, **kwargs)
                attempt += 1
                # new function identity → fresh compilation-cache entry
                fresh = lambda *a, **k: fn(*a, **k)  # noqa: E731
                state["jitted"] = jax.jit(fresh, **jit_kwargs)
                state["validated"] = False

    call._state = state  # introspection: tests assert _cache_size() == 1
    return call
