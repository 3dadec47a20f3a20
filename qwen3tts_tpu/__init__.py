"""qwen3tts_tpu — TPU-native real-time Qwen3-TTS inference framework.

Built from scratch in JAX/XLA/Pallas with the same capabilities as the
CUDA-graph reference engine `faster-qwen3-tts` (see SURVEY.md)."""

import os as _os


def _host_fingerprint():
    """Short stable id of the local CPU's ISA surface (machine arch + the
    /proc/cpuinfo feature flags), used to partition the XLA compile cache
    per host type."""
    try:
        import hashlib
        import platform

        txt = platform.machine()
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith(("flags", "Features")):
                        txt += line
                        break
        except OSError:
            pass
        return hashlib.sha1(txt.encode()).hexdigest()[:8]
    except Exception:  # pragma: no cover
        return "host"


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
        # Key the cache by the platform set AND a host CPU fingerprint:
        # XLA:CPU persists AOT machine code keyed only by program, so an
        # entry compiled on a host with e.g. +prefer-no-scatter SIGABRTs
        # when loaded on a host without it.  The platform component keeps
        # tunneled-TPU (axon) entries separate; the fingerprint invalidates
        # everything when the local machine changes (one recompile per new
        # host beats a hard abort).
        platforms = str(getattr(jax.config, "jax_platforms", None) or "default")
        cache_dir = _os.path.join(
            cache_dir,
            platforms.replace(",", "-") + "-" + _host_fingerprint())
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
