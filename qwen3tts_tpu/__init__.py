"""qwen3tts_tpu — TPU-native real-time Qwen3-TTS inference framework.

Built from scratch in JAX/XLA/Pallas with the same capabilities as the
CUDA-graph reference engine `faster-qwen3-tts` (see SURVEY.md)."""

import os as _os


def _host_fingerprint():
    """Short stable id of the local CPU (machine arch + model name + the
    /proc/cpuinfo feature flags), used to partition the XLA compile cache
    per host type.

    The model name matters, not just the flags: XLA:CPU's AOT object code
    embeds *tuning* preferences chosen from the detected CPU model (e.g.
    ``+prefer-no-gather``) that never appear in /proc/cpuinfo flags, so two
    hosts with identical flag lines can still produce mutually unloadable
    cache entries (observed: every driver-side load failed with
    ``cpu_aot_loader`` machine-feature errors and recompiled cold,
    MULTICHIP_r04)."""
    try:
        import hashlib
        import platform

        txt = platform.machine()
        # family/model/stepping are the raw CPUID identity LLVM keys its
        # tuning detection on; "model name" strings can be generic under
        # virtualization.  Stop after the first core's block.
        want = ("flags", "Features", "model name", "cpu family",
                "model\t", "stepping")
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if not line.strip():
                        break
                    if line.startswith(want):
                        txt += line
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

        # Pure-CPU processes (JAX_PLATFORMS=cpu — the test suite and the
        # driver's multi-chip dryrun) get NO persistent cache: this jax
        # build's XLA:CPU AOT cache never loads its own entries — the
        # object code embeds LLVM tuning preferences (+prefer-no-scatter)
        # as required target features, and the loader checks them against
        # host CPUID features, which never include preferences.  Measured
        # same-host: a second fresh process fails to load what the first
        # wrote (docs/RESULTS.md round 5; MULTICHIP_r04 rc=124 was this).
        # A CPU cache is pure cost.  TPU/axon processes keep the cache —
        # TPU executables don't go through cpu_aot_loader, and a cold
        # remote compile costs minutes.
        platforms_now = (
            _os.environ.get("JAX_PLATFORMS", "")
            or str(getattr(jax.config, "jax_platforms", None) or "")
        )
        if platforms_now and set(platforms_now.split(",")) <= {"cpu"}:
            return

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
