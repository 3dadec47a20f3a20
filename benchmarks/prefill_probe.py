#!/usr/bin/env python3
"""Prefill latency by bucket: device time vs the TTFA budget.

TTFA (chunk8 ramped) is ~124 ms; bench runs show prefill_ms 54-82 ms of it.
This probe times the jitted prefill alone per bucket (pipelined, donated KV)
to separate device prefill cost from host prompt-build + dispatch overhead.

Run: python benchmarks/prefill_probe.py [--iters 20]
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
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--buckets", default="128,256,512,1024")
    args = p.parse_args()

    from qwen3tts_tpu.core.loader import load_pretrained
    from qwen3tts_tpu.models.predictor import SamplingPolicy
    from qwen3tts_tpu.runtime.engine import Engine, GenerationPolicy, make_knobs

    cfg, params = load_pretrained(f"random:{args.preset}")
    eng = Engine(params["talker"], params["predictor"], cfg)
    H = cfg.talker.hidden_size
    dt = cfg.jnp_dtype
    pol, ppol = GenerationPolicy(), SamplingPolicy()
    knobs = make_knobs(pol, ppol)
    key = jax.random.PRNGKey(0)

    results = {}
    for Tb in [int(b) for b in args.buckets.split(",")]:
        embeds = jnp.zeros((1, Tb, H), dt)
        kv = eng.new_kv()

        log(f"bucket {Tb}: compiling...")
        state = eng._prefill_jit(params["talker"], embeds,
                                 jnp.zeros((1,), jnp.int32), kv, key, knobs,
                                 policy=pol.static)
        jax.block_until_ready(state["token"])

        t0 = time.time()
        for _ in range(args.iters):
            state = eng._prefill_jit(params["talker"], embeds,
                                     jnp.zeros((1,), jnp.int32), state["kv"],
                                     key, knobs, policy=pol.static)
        jax.block_until_ready(state["token"])
        t = (time.time() - t0) / args.iters
        results[Tb] = round(t * 1e3, 2)
        log(f"bucket {Tb}: {t*1e3:.2f} ms")

    out = {"device": str(jax.devices()[0]), "prefill_ms_by_bucket": results}
    log(json.dumps(out))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
