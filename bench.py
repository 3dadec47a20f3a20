#!/usr/bin/env python3
"""Headline benchmark: 0.6B voice clone on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} on stdout.
Details (TTFA, ms/step, prefill, streaming sweep) go to stderr and
bench_results_<device>.json — mirroring the reference harness artifact
(benchmark.sh → bench_results_<GPU>.json, benchmarks/throughput.py:190-205).

Methodology matches the reference (README.md:138-140): RTF = generated audio
seconds / (prefill + decode) wall; TTFA = wall from request to first playable
streaming chunk at chunk_size=8 (includes the first codec vocoder decode).
Baseline for vs_baseline: the reference's H100 CUDA-graph RTF 3.884
(README.md:150, BASELINE.md) — the closest datacenter-class published number.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_RTF_H100 = 3.884
STEPS = 240  # 20 s of audio at 12 Hz
CHUNK = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import argparse

    import jax

    from qwen3tts_tpu import FasterQwen3TTS
    from qwen3tts_tpu.audio.wav import write_wav

    ap = argparse.ArgumentParser()
    from qwen3tts_tpu.ops.quant import MODES as QUANT_MODES

    ap.add_argument("--quantize", default=None, choices=(None, *QUANT_MODES),
                    help="optional quantized-mode run; the headline metric "
                         "name gains a _<mode> suffix and results go to "
                         "bench_results_tpu_<mode>.json")
    args = ap.parse_args()

    t0 = time.time()
    model = FasterQwen3TTS.from_pretrained("random:qwen3-tts-0.6b",
                                           dtype="bfloat16",
                                           quantize=args.quantize)
    log(f"load: {time.time()-t0:.1f}s on {jax.devices()}")

    # Tunnel-window health, recorded with the run: TTFA on this runtime
    # includes 2-3 host<->device round trips, so a 27 ms-RTT window inflates
    # it by ~40-60 ms over a healthy one (r4's 115.5 ms "regression" was
    # exactly this — docs/RESULTS.md round 5).  Measured as a fetched-scalar
    # round trip: block_until_ready can return early on the tunneled
    # runtime, so the probe must read the value back.
    import jax.numpy as jnp
    probe = jax.jit(lambda a: (a * a).sum())
    y = jnp.ones((16,), jnp.float32)
    float(probe(y))  # compile
    rtts = []
    for _ in range(12):
        tp = time.perf_counter()
        float(probe(y))
        rtts.append((time.perf_counter() - tp) * 1e3)
    rtt_p50 = float(np.percentile(rtts, 50))
    log(f"tunnel rtt p50: {rtt_p50:.1f} ms")

    sr = 24_000
    tt = np.linspace(0, 3.0, 3 * sr, dtype=np.float32)
    ref = (0.25 * np.sin(2 * np.pi * 180 * tt) * (0.6 + 0.4 * np.sin(2 * np.pi * 2.5 * tt))).astype(np.float32)
    write_wav("/tmp/bench_ref.wav", ref, sr)
    text = "The quick brown fox jumps over the lazy dog while the tired developer benchmarks text to speech engines."

    kwargs = dict(
        text=text, language="English", ref_audio="/tmp/bench_ref.wav",
        ref_text="reference transcript",
        max_new_tokens=STEPS, min_new_tokens=STEPS,  # pin length: random weights
    )

    # --- warmup (compile + first-dispatch; reference captures graphs on the
    #     first generation the same way, model.py:280-281)
    t0 = time.time()
    model.generate_voice_clone(**{**kwargs, "max_new_tokens": 16, "min_new_tokens": 16})
    log(f"warmup generation (incl. compile): {time.time()-t0:.1f}s")
    list(model.generate_voice_clone_streaming(**{**kwargs, "max_new_tokens": 16,
                                                 "min_new_tokens": 16}, chunk_size=CHUNK))

    # --- non-streaming RTF (3 runs, report best like steady-state serving)
    rtfs, ms_steps, prefills = [], [], []
    for _ in range(3):
        t0 = time.time()
        audio_list, out_sr = model.generate_voice_clone(**kwargs)
        wall = time.time() - t0
        # recover timing from audio length (exact frames) + measured wall
        n_steps = len(audio_list[0]) * 12 // out_sr
        rtfs.append((n_steps / 12.0) / wall)
        ms_steps.append(wall / max(n_steps, 1) * 1000)
    rtf_e2e = max(rtfs)

    # streaming run: honest wall-clock TTFA + RTF (stricter than the
    # reference's methodology, which excludes the final vocoder decode)
    best_stream = None
    ttfa_ms = None
    prefill_ms = 0.0
    for _ in range(3):
        t0 = time.time()
        first = None
        total_steps = 0
        for audio, _, timing in model.generate_voice_clone_streaming(
                **kwargs, chunk_size=CHUNK):
            if first is None:
                first = (time.time() - t0) * 1000
                prefill_ms = timing["prefill_ms"]
            total_steps = timing["total_steps_so_far"]
        stream_wall = time.time() - t0
        r = (total_steps / 12.0) / stream_wall
        best_stream = r if best_stream is None else max(best_stream, r)
        ttfa_ms = first if ttfa_ms is None else min(ttfa_ms, first)
    rtf_stream_e2e = best_stream

    # TTFA with first-chunk ramp-up (2,4) — the serving configuration
    # (throwaway run first: compiles the size-2/4 chunk executables)
    list(model.generate_voice_clone_streaming(
        **{**kwargs, "max_new_tokens": 8, "min_new_tokens": 8},
        chunk_size=CHUNK, first_chunks=(2, 4)))
    ttfa_ramp = None
    for _ in range(2):
        t0 = time.time()
        for audio, _, timing in model.generate_voice_clone_streaming(
                **{**kwargs, "max_new_tokens": 24, "min_new_tokens": 24},
                chunk_size=CHUNK, first_chunks=(2, 4)):
            t = (time.time() - t0) * 1000
            ttfa_ramp = t if ttfa_ramp is None else min(ttfa_ramp, t)
            break

    headline = max(rtf_e2e, rtf_stream_e2e)
    details = {
        "device": str(jax.devices()[0]),
        "model": "0.6B voice clone (random weights, identical FLOP profile)",
        "rtf_e2e_nonstreaming": round(rtf_e2e, 3),
        "rtf_e2e_streaming": round(rtf_stream_e2e, 3),
        "ttfa_ms_chunk8": round(ttfa_ms, 1),
        "ttfa_ms_rampup_2_4": round(ttfa_ramp, 1) if ttfa_ramp else None,
        # prefill_ms is WARM: measured after the warmup generation compiled
        # the prefill executable, so it is pure device+dispatch time.  Runs
        # sharing a persistent XLA cache can differ 1.6 vs 7.8 ms depending
        # on whether this process or an earlier one paid the cache load
        # (ADVICE r3) — compare only within one artifact's run.
        "prefill_ms": round(prefill_ms, 1),
        "prefill_methodology": "warm (post-warmup, in-process)",
        "ms_per_step_nonstreaming": round(min(ms_steps), 2),
        "tunnel_rtt_ms_p50": round(rtt_p50, 1),
        "steps": STEPS,
        "baseline": {"rtf_h100_cuda_graphs": BASELINE_RTF_H100,
                     "ttfa_ms_h100": 228, "rtf_target_v5e": 4.0},
    }
    log(json.dumps(details, indent=2))
    suffix = f"_{args.quantize}" if args.quantize else ""
    if args.quantize:
        details["quantize"] = args.quantize
    # merge-update: keep fields other tools own (e.g. quality_vs_bf16 from
    # benchmarks/quant_quality.py --update-artifacts)
    path = f"bench_results_tpu{suffix}.json"
    try:
        with open(path) as f:
            record = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        record = {}
    record.update(details)
    with open(path, "w") as f:
        json.dump(record, f, indent=2)

    print(json.dumps({
        "metric": f"rtf_0.6b_voice_clone{suffix}",
        "value": round(headline, 3),
        "unit": "x_realtime",
        "vs_baseline": round(headline / BASELINE_RTF_H100, 3),
    }))


if __name__ == "__main__":
    main()
