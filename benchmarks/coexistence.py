#!/usr/bin/env python3
"""Coexistence benchmark: TTS latency while a second model shares the chip.

The reference's parakeet_coexistence.py measures TTS RTF/TTFA degradation
with the nano-parakeet ASR model resident and periodically transcribing on
the same GPU.  No ASR checkpoint exists in this environment, so the
coexisting workload here is a second (tiny) TTS model generating between
chunks — same question: how much does a co-resident model's memory + compute
pressure cost the latency path?
"""
import sys
import time

sys.path.insert(0, ".")
from benchmarks.common import (TEXT, LANGUAGE, load_model, make_ref_audio,
                               measure_streaming, write_results)


def main():
    from qwen3tts_tpu import FasterQwen3TTS

    model = load_model()
    ref = make_ref_audio()
    kw = dict(ref_audio=ref, ref_text="r")

    measure_streaming(model, chunk_size=8, steps=16, **kw)  # compile
    solo = measure_streaming(model, chunk_size=8, steps=96, **kw)

    # load the co-resident model and warm it
    other = FasterQwen3TTS.from_pretrained("random:tiny", dtype="bf16")
    other.generate_voice_clone("Warm.", "English", ref, "r",
                               max_new_tokens=8, min_new_tokens=8)

    # interleave: other model generates between main-model runs
    t0 = time.time()
    other.generate_voice_clone("Co-resident workload.", "English", ref, "r",
                               max_new_tokens=24, min_new_tokens=24)
    coexist = measure_streaming(model, chunk_size=8, steps=96, **kw)
    other.generate_voice_clone("Co-resident workload.", "English", ref, "r",
                               max_new_tokens=24, min_new_tokens=24)

    write_results("coexistence", {
        "solo": solo,
        "with_coresident_model": coexist,
        "rtf_degradation_pct": round(
            (solo["rtf"] - coexist["rtf"]) / solo["rtf"] * 100, 1)
        if solo["rtf"] else None,
    })


if __name__ == "__main__":
    main()
