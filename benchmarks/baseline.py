#!/usr/bin/env python3
"""Baseline benchmark: the deliberately-slow parity path (per-step host sync,
un-bucketed prefill) — the analog of the reference's upstream dynamic-cache
baseline (benchmarks/baseline.py)."""
import sys

sys.path.insert(0, ".")
from benchmarks.common import (STEPS, load_model, make_ref_audio,
                               measure_streaming, write_results)


def main():
    model = load_model()
    ref = make_ref_audio()
    kw = dict(ref_audio=ref, ref_text="reference transcript")
    steps = min(STEPS, 96)  # parity path is slow; keep the run bounded

    measure_streaming(model, chunk_size=8, steps=16, parity=True, **kw)  # warmup
    run = measure_streaming(model, chunk_size=8, steps=steps, parity=True, **kw)
    write_results("baseline_parity", run)


if __name__ == "__main__":
    main()
