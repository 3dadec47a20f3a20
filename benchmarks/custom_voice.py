#!/usr/bin/env python3
"""CustomVoice benchmark (reference benchmarks/custom_voice.py): RTF/TTFA for
the predefined-speaker path on the CustomVoice model family."""
import os
import sys
import time

sys.path.insert(0, ".")
from benchmarks.common import STEPS, TEXT, LANGUAGE, write_results

SPEAKER = os.environ.get("SPEAKER", "vivian")


def measure(model, steps):
    t0 = time.time()
    ttfa = None
    total = 0
    for audio, sr, tim in model.generate_custom_voice_streaming(
        text=TEXT, speaker=SPEAKER, language=LANGUAGE,
        chunk_size=8, max_new_tokens=steps, min_new_tokens=steps,
    ):
        if ttfa is None:
            ttfa = (time.time() - t0) * 1000
        total = tim["total_steps_so_far"]
    wall = time.time() - t0
    return {"ttfa_ms": round(ttfa, 1), "rtf": round(total / 12.0 / wall, 3),
            "ms_per_step": round(wall / max(total, 1) * 1000, 2), "steps": total}


def main():
    from qwen3tts_tpu import FasterQwen3TTS

    size = os.environ.get("MODEL_SIZE", "0.6B").lower()
    model = FasterQwen3TTS.from_pretrained(
        os.environ.get("QWEN_TTS_CUSTOM_MODEL", f"random:qwen3-tts-{size}-custom"),
        dtype="bf16")
    measure(model, 16)  # compile
    write_results("custom_voice", {"speaker": SPEAKER,
                                   "run": measure(model, min(STEPS, 120))})


if __name__ == "__main__":
    main()
