#!/usr/bin/env python3
"""Chunk-size sweep: TTFA/RTF vs chunk_size (reference benchmarks/chunk_sweep.py
and README.md:194-205 table)."""
import sys

sys.path.insert(0, ".")
from benchmarks.common import (STEPS, load_model, make_ref_audio,
                               measure_streaming, write_results)

CHUNKS = (1, 2, 4, 8, 12)


def main():
    model = load_model()
    ref = make_ref_audio()
    kw = dict(ref_audio=ref, ref_text="reference transcript")

    results = {}
    for cs in CHUNKS:
        measure_streaming(model, chunk_size=cs, steps=max(cs * 2, 8), **kw)  # compile
        run = measure_streaming(model, chunk_size=cs, steps=min(STEPS, 120), **kw)
        run["audio_per_chunk_ms"] = round(cs / 12.0 * 1000)
        results[str(cs)] = run
    write_results("chunk_sweep", results)


if __name__ == "__main__":
    main()
