"""TPU-native speech-to-text + affective intelligence framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``sentiric/sentiric-stt-whisper-service`` (see SURVEY.md): Whisper
encoder–decoder with KV-cached on-device decoding (greedy / beam /
temperature fallback), Pallas-fused log-mel frontend and flash attention,
batched prosody extraction, speaker diarization, hallucination filtering,
and gRPC + OpenAI-compatible HTTP serving with continuous batching.
"""

__version__ = "0.1.0"

from .config import Settings, load_settings  # noqa: F401
