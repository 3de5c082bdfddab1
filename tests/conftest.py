import os

# Tests run on a virtual 8-device CPU mesh with float64/complex128 enabled,
# so numerics can be validated to 1e-10 against the NumPy oracle.
#
# NOTE: this machine's sitecustomize pins JAX_PLATFORMS=axon (TPU) and
# imports jax at interpreter start, so env vars alone are too late —
# jax.config.update is the reliable override (CPU client is created lazily).
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "parallel_codegen" not in flags:
    # suite-stability experiment for the ~160-test XLA:CPU compiler crash
    # (scripts/run_tests.sh header): serialize LLVM codegen — the crash is a
    # segfault inside backend_compile_and_load after many compiles in one
    # process, consistent with a codegen-thread resource issue
    flags += " --xla_cpu_parallel_codegen_split_count=1"
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# No persistent compilation cache in tests: newer jax enables a default
# cache dir, and its zstandard writer segfaulted a full-suite run mid-write
# (2026-08-18, ~80% through, put_executable_and_time frame). Test programs
# are small; compiling them fresh is cheaper than a crashy cache.
try:
    jax.config.update("jax_enable_compilation_cache", False)
except Exception:
    pass

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The XLA:CPU compiler segfaulted twice at test ~160 of a full-suite
    run (backend_compile_and_load frame) while every module passes
    standalone — an accumulated-compile-state crash. Dropping live
    executables between modules keeps the in-process compiler young."""
    yield
    jax.clear_caches()
