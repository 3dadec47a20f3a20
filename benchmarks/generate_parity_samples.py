#!/usr/bin/env python3
"""Regenerate the committed parity sample WAVs (audio-quality regression
mechanism of the reference: fixed-seed samples + README instead of waveform
asserts — reference samples/parity/README.md, generate_parity_samples.py,
seed 1337)."""
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")

SEED = int(os.environ.get("SEED", 1337))
OUT = Path(os.environ.get("SAMPLES_DIR", "samples/parity"))
MODEL = os.environ.get("QWEN_TTS_MODEL", "random:tiny")
PROMPTS = [
    "Short parity test.",
    "A second, slightly longer parity sentence for regression listening.",
]


def main():
    from qwen3tts_tpu import FasterQwen3TTS
    from qwen3tts_tpu.audio.wav import write_wav

    OUT.mkdir(parents=True, exist_ok=True)
    sr = 24_000
    t = np.linspace(0, 2.0, 2 * sr, dtype=np.float32)
    ref = (0.25 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    ref_path = OUT / "ref.wav"
    write_wav(ref_path, ref, sr)

    for pi, prompt in enumerate(PROMPTS):
        model = FasterQwen3TTS.from_pretrained(MODEL, dtype="fp32",
                                               seed=SEED + pi * 10)
        audio_list, out_sr = model.generate_voice_clone(
            prompt, "English", str(ref_path), "reference",
            max_new_tokens=48, do_sample=False,  # greedy => reproducible
        )
        name = OUT / f"parity_{pi}_greedy.wav"
        write_wav(name, audio_list[0], out_sr)
        print(f"wrote {name} ({len(audio_list[0])/out_sr:.2f}s)")

    (OUT / "README.md").write_text(
        "# Parity samples\n\n"
        f"Greedy fixed-seed outputs (seed {SEED}, model `{MODEL}`).\n"
        "Regenerate with `python benchmarks/generate_parity_samples.py`; a\n"
        "change in these files indicates a numerics/prompt-layout change —\n"
        "listen and diff before accepting (the reference repo uses the same\n"
        "committed-sample regression mechanism).\n"
    )


if __name__ == "__main__":
    main()
