"""TPU-native speech-to-text + affective intelligence framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``sentiric/sentiric-stt-whisper-service`` (see SURVEY.md): Whisper
encoder–decoder with KV-cached on-device decoding (greedy / beam /
temperature fallback), Pallas-fused log-mel frontend and flash attention,
batched prosody extraction, speaker diarization, hallucination filtering,
and gRPC + OpenAI-compatible HTTP serving with continuous batching.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: large-v3 executables take minutes to
# compile; cached loads are seconds. Opt out with SSTW_NO_COMPILE_CACHE=1.
if not _os.environ.get("SSTW_NO_COMPILE_CACHE"):
    import jax as _jax

    _cache_dir = _os.environ.get(
        "SSTW_COMPILE_CACHE_DIR",
        _os.path.expanduser("~/.cache/sstw_jax_cache"),
    )
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from .config import Settings, load_settings  # noqa: F401
