#!/usr/bin/env python3
"""Batched-decode throughput sweep: frames/s/chip at B ∈ {1, 2, 4, 8}.

The reference engine is strictly batch-1 (SURVEY §2.4) — its throughput
ceiling is its latency.  Batched decode amortizes the weight streaming that
dominates batch-1 decode (benchmarks/decompose.py), so frames/s/chip scales
far past the reference's per-chip number while single-stream latency mode
stays available.

Usage: python benchmarks/batched.py [--preset qwen3-tts-0.6b] [--steps 120]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="qwen3-tts-0.6b")
    p.add_argument("--steps", type=int, default=120)
    p.add_argument("--batches", default="1,2,4,8")
    p.add_argument("--quantize", default=None)
    p.add_argument("--kv-quant", action="store_true",
                   help="int8 KV cache (per-row caches dominate at B>1)")
    p.add_argument("--vocode", action="store_true",
                   help="same-work serving ceiling: fused decode+vocode "
                   "chunks (Engine.chunk_vocode_batched) with a 1-deep "
                   "pipelined host audio fetch per chunk — the honest "
                   "denominator for steady-state serving efficiency "
                   "(the token-only sweep excludes vocoder FLOPs and the "
                   "audio wire, which serving must pay)")
    p.add_argument("--vocode-chunk", type=int, default=8)
    p.add_argument("--no-pcm16", action="store_true",
                   help="fetch f32 audio instead of device-quantized PCM16")
    args = p.parse_args()

    from qwen3tts_tpu.core.loader import load_pretrained
    from qwen3tts_tpu.models.predictor import SamplingPolicy
    from qwen3tts_tpu.runtime import loops
    from qwen3tts_tpu.runtime.engine import Engine, GenerationPolicy

    cfg, params = load_pretrained(f"random:{args.preset}")
    if args.quantize:
        from qwen3tts_tpu.ops.quant import quantize_bundle
        params = quantize_bundle(params, args.quantize)
    H = cfg.talker.hidden_size
    dt = cfg.jnp_dtype
    pol = GenerationPolicy()
    ppol = SamplingPolicy()
    frame_rate = cfg.codec.frame_rate
    results = {}

    for B in [int(x) for x in args.batches.split(",")]:
        eng = Engine(params["talker"], params["predictor"], cfg, batch=B,
                     kv_quant=args.kv_quant)
        embeds = jnp.asarray(
            np.random.RandomState(0).randn(B, 24, H), dt) * 0.02
        tth = jnp.asarray(np.random.RandomState(1).randn(B, 16, H), dt) * 0.02
        tpe = jnp.zeros((B, 1, H), dt)

        if args.vocode:
            from qwen3tts_tpu.audio.vocoder import Vocoder
            from qwen3tts_tpu.runtime.engine import make_knobs

            voc = Vocoder(params["codec"], cfg.codec, compute_dtype=dt)
            knobs = make_knobs(pol, ppol)
            chunk = args.vocode_chunk
            nchunks = max(1, args.steps // chunk)
            tth_lens = jnp.full((B,), tth.shape[1], jnp.int32)
            pcm16 = not args.no_pcm16

            def run():
                state = eng.prefill(embeds, jax.random.PRNGKey(0), pol)
                vst = voc.stream_state_batched(B)
                prev = None
                t0 = time.perf_counter()
                for _ in range(nchunks):
                    out = eng.chunk_vocode_batched(
                        voc, state, tth, tth_lens, tpe, pol, ppol, chunk,
                        vst, knobs=knobs, pcm16=pcm16)
                    state, vst = out[0], out[6]
                    if prev is not None:
                        np.asarray(prev)  # host audio fetch: the wire cost
                    prev = out[5]
                np.asarray(prev)
                wall = time.perf_counter() - t0
                eng.release(state)
                return nchunks * chunk * B / wall
        else:
            def run():
                _, timing = loops.fast_generate_batch(
                    eng, embeds, tth, tpe, key=jax.random.PRNGKey(0),
                    max_new_tokens=args.steps, policy=pol, pred_policy=ppol,
                    device_chunk=16)
                return timing["steps"] / timing["decode_s"]

        run()  # compile
        best = None
        for _ in range(2):
            fps = run()
            best = fps if best is None else max(best, fps)
        results[B] = {
            "frames_per_s": round(best, 1),
            "rtf_aggregate": round(best / frame_rate, 2),
            "ms_per_frame": round(1000.0 / best, 3),
        }
        log(f"B={B}: {results[B]}")

    out = {"device": str(jax.devices()[0]), "preset": args.preset,
           "quantize": args.quantize, "kv_quant": args.kv_quant,
           "steps": args.steps, "sweep": results}
    log(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
