#!/usr/bin/env python3
"""Regenerate ICL-mode parity samples (reference
generate_parity_samples_icl.py: fixed seed per (ref, prompt) pair —
seed 1337 + ref*10 + prompt).  The optional ASR verification loop of the
reference requires nano-parakeet, which is pluggable but absent here."""
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")

SEED = int(os.environ.get("SEED", 1337))
OUT = Path(os.environ.get("SAMPLES_DIR", "samples/parity_icl"))
MODEL = os.environ.get("QWEN_TTS_MODEL", "random:tiny")
PROMPTS = ["ICL parity sample one.", "ICL parity sample two."]


def main():
    from qwen3tts_tpu import FasterQwen3TTS
    from qwen3tts_tpu.audio.wav import write_wav

    OUT.mkdir(parents=True, exist_ok=True)
    sr = 24_000
    refs = []
    for ri, freq in enumerate((180.0, 240.0)):
        t = np.linspace(0, 2.0, 2 * sr, dtype=np.float32)
        ref = (0.25 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
        path = OUT / f"ref_{ri}.wav"
        write_wav(path, ref, sr)
        refs.append(path)

    for ri, ref_path in enumerate(refs):
        for pi, prompt in enumerate(PROMPTS):
            seed = SEED + ri * 10 + pi
            model = FasterQwen3TTS.from_pretrained(MODEL, dtype="fp32", seed=seed)
            audio_list, out_sr = model.generate_voice_clone(
                prompt, "English", str(ref_path), "reference transcript",
                xvec_only=False,  # full ICL: codec-encoded ref in context
                max_new_tokens=36, do_sample=False,
            )
            name = OUT / f"icl_r{ri}_p{pi}.wav"
            write_wav(name, audio_list[0], out_sr)
            print(f"wrote {name} ({len(audio_list[0])/out_sr:.2f}s)")

    (OUT / "README.md").write_text(
        f"# ICL parity samples\n\nGreedy, seed {SEED}+ref*10+prompt, model "
        f"`{MODEL}`, full-ICL mode.\nRegenerate with "
        "`python benchmarks/generate_parity_samples_icl.py`.\n"
    )


if __name__ == "__main__":
    main()
