"""qwen3tts_tpu — TPU-native real-time Qwen3-TTS inference framework.

Built from scratch in JAX/XLA/Pallas with the same capabilities as the
CUDA-graph reference engine `faster-qwen3-tts` (see SURVEY.md)."""

import os as _os


def _enable_compile_cache():
    """Persistent XLA compilation cache: the durable analog of "graphs already
    captured" (SURVEY.md §5 checkpoint/resume row).  On the tunneled-TPU
    environment a fresh compile costs minutes; with the cache a warm process
    start reuses every executable."""
    try:
        import jax

        cache_dir = _os.environ.get(
            "QWEN3TTS_XLA_CACHE",
            _os.path.join(_os.path.dirname(_os.path.dirname(__file__)), ".xla_cache"),
        )
        # Key the cache by the platform set: under the tunneled-TPU runtime
        # even CPU-targeted programs are compiled remotely with different
        # machine features, and loading those locally risks SIGILL.
        platforms = str(getattr(jax.config, "jax_platforms", None) or "default")
        cache_dir = _os.path.join(cache_dir, platforms.replace(",", "-"))
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # persist EVERYTHING: on the tunneled TPU even trivial op-dispatch
        # programs pay ~1-2s remote-compile latency, and a warm start replays
        # ~150 of them during the first generation
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover — cache is best-effort
        pass


_enable_compile_cache()

from .api.model import FasterQwen3TTS

__version__ = "0.3.0"
__all__ = ["FasterQwen3TTS", "__version__"]
