#!/usr/bin/env python3
"""Throughput benchmark: RTF + TTFA for the fast path (reference
benchmarks/throughput.py → bench_results_<device>.json)."""
import sys
import time

sys.path.insert(0, ".")
from benchmarks.common import (REPEATS, STEPS, load_model, make_ref_audio,
                               measure_streaming, write_results)


def main():
    model = load_model()
    ref = make_ref_audio()
    kw = dict(ref_audio=ref, ref_text="reference transcript")

    # warmup (compiles, reference captures graphs on first generation)
    measure_streaming(model, chunk_size=8, steps=16, **kw)

    runs = [measure_streaming(model, chunk_size=8, steps=STEPS, **kw)
            for _ in range(REPEATS)]
    best = max(runs, key=lambda r: r["rtf"])
    write_results("throughput", {
        "best": best,
        "runs": runs,
        "config": {"chunk_size": 8, "steps": STEPS},
    })


if __name__ == "__main__":
    main()
