#!/usr/bin/env python3
"""Voice-mode comparison: x-vector clone vs full ICL clone vs CustomVoice
(reference benchmarks/compare_modes.py and README.md:207-213)."""
import sys
import time

sys.path.insert(0, ".")
from benchmarks.common import (STEPS, TEXT, LANGUAGE, load_model, make_ref_audio,
                               measure_streaming, write_results)


def _measure_custom(model, steps):
    t0 = time.time()
    ttfa = None
    total = 0
    for audio, sr, tim in model.generate_custom_voice_streaming(
        text=TEXT, speaker="vivian", language=LANGUAGE,
        chunk_size=8, max_new_tokens=steps, min_new_tokens=steps,
    ):
        if ttfa is None:
            ttfa = (time.time() - t0) * 1000
        total = tim["total_steps_so_far"]
    wall = time.time() - t0
    return {"ttfa_ms": round(ttfa, 1), "rtf": round(total / 12.0 / wall, 3),
            "ms_per_step": round(wall / max(total, 1) * 1000, 2), "steps": total}


def main():
    steps = min(STEPS, 120)
    model = load_model()
    ref = make_ref_audio()

    results = {}
    kw = dict(ref_audio=ref, ref_text="reference transcript")
    measure_streaming(model, chunk_size=8, steps=16, **kw)
    results["voiceclone_xvector"] = measure_streaming(
        model, chunk_size=8, steps=steps, xvec_only=True, **kw)
    measure_streaming(model, chunk_size=8, steps=16, xvec_only=False, **kw)
    results["voiceclone_icl"] = measure_streaming(
        model, chunk_size=8, steps=steps, xvec_only=False, **kw)

    custom = load_model().__class__.from_pretrained(
        "random:qwen3-tts-0.6b-custom", dtype="bf16")
    _measure_custom(custom, 16)
    results["customvoice"] = _measure_custom(custom, steps)

    write_results("compare_modes", results)


if __name__ == "__main__":
    main()
