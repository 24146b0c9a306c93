"""Test configuration: force a virtual 8-device CPU mesh.

All tests run on CPU so they are hermetic and can exercise multi-chip
sharding (SURVEY.md §4: multi-chip tests via
``--xla_force_host_platform_device_count`` mesh simulation).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Tests run WITHOUT the persistent compilation cache. XLA:CPU AOT
# executable ser/deserialization is not reliable on this jaxlib under a
# long full-suite process: observed SIGSEGV inside
# compilation_cache.put_executable_and_time on a FRESH cache dir ~250
# tests in (and cascading read crashes on the truncated entry it left
# behind), always under tests/test_streaming.py's first capped-tick
# decode compile, never in a standalone run of the same test. CPU
# compiles of the CI-sized models are seconds each, so correctness wins
# over warm-start time here; TPU serving processes keep the cache (they
# compile large-v3, minutes per class, and never touch CPU entries —
# prosody's serving path is pure numpy).
os.environ.setdefault("SSTW_NO_COMPILE_CACHE", "1")

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update
# is honored and must happen before any backend initialization.
jax.config.update("jax_platforms", "cpu")

import gc

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables between test modules.

    The full suite compiles ~250 XLA:CPU executables in one process; jit
    caches keep every one alive (plus its LLVM JIT code mappings) for the
    process lifetime. Round 4 shipped with a deterministic SIGSEGV inside
    ``backend_compile_and_load`` on the ~230th-compile class
    (tests/test_streaming.py's capped-tick fused executable, full-suite
    runs only — every module passes standalone; peak RSS was ~6.7 GB of
    125 GB, so not a simple OOM). Dropping the accumulated executables at
    module boundaries keeps the compiler's process-wide footprint (code
    mappings, ORC JIT state) near a single module's, which is the regime
    where every module is proven stable. Cost: shared module-level jits
    recompile per module — seconds each on the CI-sized models.
    """
    yield
    import jax

    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def make_tone(freq_hz, duration_s=1.0, sr=16000, amp=0.1):
    t = np.arange(int(duration_s * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq_hz * t)).astype(np.float32)


@pytest.fixture
def tone_220():
    return make_tone(220.0)
