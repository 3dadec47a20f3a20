#!/usr/bin/env bash
# One-time environment warmup (the reference's setup.sh pre-downloads models;
# with zero egress here, the analogous step is pre-compiling the jitted
# executables into the persistent XLA cache so first real use is fast).
set -euo pipefail
cd "$(dirname "$0")"

MODEL="${1:-random:qwen3-tts-0.6b}"
# FULL=1: also pre-compile EVERY (prefill, tth, chunk) bucket so no serving
# request of any length ever hits a compile stall (engine.warmup_all)
FULL="${FULL:-1}"

python - <<EOF
import numpy as np, time
from qwen3tts_tpu import FasterQwen3TTS
from qwen3tts_tpu.audio.wav import write_wav

sr = 24000
t = np.linspace(0, 2.0, 2 * sr, dtype=np.float32)
write_wav("/tmp/setup_ref.wav", (0.2 * np.sin(2 * np.pi * 200 * t)).astype(np.float32), sr)

print("warming '$MODEL' (compiles cached into .xla_cache)...")
m = FasterQwen3TTS.from_pretrained("$MODEL", dtype="bf16")
t0 = time.time()
if "$FULL" == "1":
    m.warmup_all(chunk_sizes=(2, 4, 8, 16))  # every prefill/tth bucket
m.generate_voice_clone("Warmup.", "English", "/tmp/setup_ref.wav", "ref",
                       max_new_tokens=16, min_new_tokens=16)
list(m.generate_voice_clone_streaming("Warmup.", "English", "/tmp/setup_ref.wav",
                                      "ref", max_new_tokens=16, min_new_tokens=16,
                                      chunk_size=8))
print(f"warm in {time.time()-t0:.1f}s; subsequent runs of ANY length reuse the cache")
EOF
