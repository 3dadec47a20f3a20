"""qwen3tts_tpu — TPU-native real-time Qwen3-TTS inference framework.

Built from scratch in JAX/XLA/Pallas with the same capabilities as the
CUDA-graph reference engine `faster-qwen3-tts` (see SURVEY.md)."""

from .api.model import FasterQwen3TTS

__version__ = "0.1.0"
__all__ = ["FasterQwen3TTS", "__version__"]
