#!/usr/bin/env python3
"""Regenerate non_streaming_mode comparison samples (reference
generate_non_streaming_samples.py: same prompt with non_streaming_mode on/off
at a fixed seed, for listening comparison)."""
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")

SEED = int(os.environ.get("SEED", 1337))
OUT = Path(os.environ.get("SAMPLES_DIR", "samples/non_streaming_mode"))
MODEL = os.environ.get("QWEN_TTS_MODEL", "random:tiny")
PROMPT = "Comparing the packed and incremental text layouts."


def main():
    from qwen3tts_tpu import FasterQwen3TTS
    from qwen3tts_tpu.audio.wav import write_wav

    OUT.mkdir(parents=True, exist_ok=True)
    sr = 24_000
    t = np.linspace(0, 2.0, 2 * sr, dtype=np.float32)
    ref_path = OUT / "ref.wav"
    write_wav(ref_path, (0.25 * np.sin(2 * np.pi * 200 * t)).astype(np.float32), sr)

    for mode in (True, False):
        model = FasterQwen3TTS.from_pretrained(MODEL, dtype="fp32", seed=SEED)
        audio_list, out_sr = model.generate_voice_clone(
            PROMPT, "English", str(ref_path), "reference",
            non_streaming_mode=mode, max_new_tokens=36, do_sample=False,
        )
        name = OUT / f"non_streaming_{'on' if mode else 'off'}.wav"
        write_wav(name, audio_list[0], out_sr)
        print(f"wrote {name}")

    (OUT / "README.md").write_text(
        f"# non_streaming_mode samples\n\nSeed {SEED}, greedy, model `{MODEL}`.\n"
        "`on` packs the full text into the prefill (reference model.py:472-504);\n"
        "`off` feeds text token-by-token during decode.  Regenerate with\n"
        "`python benchmarks/generate_non_streaming_samples.py`.\n"
    )


if __name__ == "__main__":
    main()
