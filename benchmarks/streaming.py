#!/usr/bin/env python3
"""Streaming latency benchmark: TTFA + per-chunk cadence at a given
chunk_size, with and without first-chunk ramp-up (reference
benchmarks/streaming.py measures the TTFA path)."""
import os
import sys
import time

sys.path.insert(0, ".")
from benchmarks.common import (STEPS, TEXT, LANGUAGE, load_model,
                               make_ref_audio, write_results)

CHUNK = int(os.environ.get("CHUNK_SIZE", 8))


def run(model, ref, first_chunks):
    t0 = time.time()
    ttfa = None
    cadence = []
    last = t0
    total = 0
    for audio, sr, tim in model.generate_voice_clone_streaming(
        text=TEXT, language=LANGUAGE, ref_audio=ref, ref_text="r",
        chunk_size=CHUNK, max_new_tokens=min(STEPS, 120),
        min_new_tokens=min(STEPS, 120), first_chunks=first_chunks,
    ):
        now = time.time()
        if ttfa is None:
            ttfa = (now - t0) * 1000
        else:
            cadence.append((now - last) * 1000)
        last = now
        total = tim["total_steps_so_far"]
    wall = time.time() - t0
    return {
        "ttfa_ms": round(ttfa, 1),
        "rtf": round(total / 12.0 / wall, 3),
        "mean_chunk_ms": round(sum(cadence) / max(len(cadence), 1), 1),
        "max_chunk_ms": round(max(cadence), 1) if cadence else None,
        "steps": total,
    }


def main():
    model = load_model()
    ref = make_ref_audio()
    # compile both schedules
    run(model, ref, ())
    run(model, ref, (2, 4))
    write_results("streaming", {
        "chunk_size": CHUNK,
        "plain": run(model, ref, ()),
        "rampup_2_4": run(model, ref, (2, 4)),
    })


if __name__ == "__main__":
    main()
