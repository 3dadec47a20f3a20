"""Decode loops: non-streaming, streaming, and parity paths.

Orchestrates Engine prefill + chunked decode.  Timing-dict contracts match the
reference exactly (generate.py:205-211, streaming.py:162-169) so benchmarks
and the app layer carry over unchanged.  ``jax.block_until_ready`` replaces
``torch.cuda.synchronize`` at the same bracket points (SURVEY.md §5 tracing).
"""
from __future__ import annotations

import time
from typing import Dict, Generator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.predictor import SamplingPolicy
from .engine import Engine, GenerationPolicy, TTH_BUCKETS, bucket_for

Frames = np.ndarray  # [steps, 16] int32


def _pad_tth(tth: jnp.ndarray, tpe: jnp.ndarray, bucketed: bool) -> Tuple[jnp.ndarray, int]:
    """Pad trailing-text hiddens to a bucket with the tts_pad embedding
    (reference model.py:537-551 pads with tts_pad_embed)."""
    B, T, H = tth.shape
    Tb = bucket_for(max(T, 1), TTH_BUCKETS) if bucketed else max(T, 1)
    if Tb > T:
        pad = jnp.broadcast_to(tpe, (B, Tb - T, H))
        tth = jnp.concatenate([tth, pad], axis=1)
    return tth, T


def fast_generate(
    engine: Engine,
    talker_input_embeds: jnp.ndarray,  # [B, T, H]
    trailing_text_hiddens: jnp.ndarray,  # [B, Ttth, H]
    tts_pad_embed: jnp.ndarray,  # [B, 1, H]
    *,
    key: jax.Array,
    max_new_tokens: int = 2048,
    policy: GenerationPolicy = GenerationPolicy(),
    pred_policy: SamplingPolicy = SamplingPolicy(),
    device_chunk: int = 16,
    bucketed: bool = True,
) -> Tuple[Optional[Frames], Dict]:
    """Non-streaming generation.  Returns ([steps,16] codec ids, timing)."""
    t0 = time.time()
    tth, tth_len = _pad_tth(trailing_text_hiddens, tts_pad_embed, bucketed)
    state = engine.prefill(talker_input_embeds, key, policy, bucketed=bucketed)
    jax.block_until_ready(state["token"])
    t_prefill = time.time() - t0

    t1 = time.time()
    chunks = []
    steps = 0
    while steps < max_new_tokens:
        # Always run the same chunk_size so exactly ONE executable is used;
        # the budget is enforced by trimming on host (avoids per-remainder
        # recompiles).
        state, frames, n, done = engine.decode_chunk(
            state, tth, tth_len, tts_pad_embed, policy, pred_policy, device_chunk
        )
        n = min(int(n), max_new_tokens - steps)
        if n:
            chunks.append(np.asarray(frames[0, :n]))
            steps += n
        if bool(done) or n == 0:
            break
    t_decode = time.time() - t1

    timing = {
        "prefill_ms": t_prefill * 1000,
        "decode_s": t_decode,
        "steps": steps,
        "ms_per_step": (t_decode / steps * 1000) if steps else 0.0,
        "steps_per_s": (steps / t_decode) if t_decode > 0 else 0.0,
    }
    if not chunks:
        return None, timing
    return np.concatenate(chunks, axis=0), timing


def fast_generate_streaming(
    engine: Engine,
    talker_input_embeds: jnp.ndarray,
    trailing_text_hiddens: jnp.ndarray,
    tts_pad_embed: jnp.ndarray,
    *,
    key: jax.Array,
    max_new_tokens: int = 2048,
    policy: GenerationPolicy = GenerationPolicy(),
    pred_policy: SamplingPolicy = SamplingPolicy(),
    chunk_size: int = 8,
    bucketed: bool = True,
) -> Generator[Tuple[Frames, Dict], None, None]:
    """Streaming generation: yields ([chunk_steps,16], timing) every chunk.

    One device program + one host sync per chunk (the reference pays a sync
    per *step*, streaming.py:107).  Timing keys match streaming.py:162-169.
    """
    t0 = time.time()
    tth, tth_len = _pad_tth(trailing_text_hiddens, tts_pad_embed, bucketed)
    state = engine.prefill(talker_input_embeds, key, policy, bucketed=bucketed)
    jax.block_until_ready(state["token"])
    t_prefill = time.time() - t0

    total_steps = 0
    chunk_count = 0
    budget = max_new_tokens
    chunk_start = time.time()
    while budget > 0:
        state, frames, n, done = engine.decode_chunk(
            state, tth, tth_len, tts_pad_embed, policy, pred_policy, chunk_size
        )
        n = min(int(n), budget)
        done = bool(done)
        budget -= n
        if n:
            total_steps += n
            chunk_decode = time.time() - chunk_start
            yield np.asarray(frames[0, :n]), {
                "chunk_index": chunk_count,
                "chunk_steps": n,
                "prefill_ms": t_prefill * 1000 if chunk_count == 0 else 0,
                "decode_ms": chunk_decode * 1000,
                "total_steps_so_far": total_steps,
                "is_final": done or budget <= 0,
            }
            chunk_count += 1
            chunk_start = time.time()
        if done or n == 0:
            break


def parity_generate(
    engine: Engine,
    talker_input_embeds: jnp.ndarray,
    trailing_text_hiddens: jnp.ndarray,
    tts_pad_embed: jnp.ndarray,
    *,
    key: jax.Array,
    max_new_tokens: int = 2048,
    policy: GenerationPolicy = GenerationPolicy(),
    pred_policy: SamplingPolicy = SamplingPolicy(),
) -> Tuple[Optional[Frames], Dict]:
    """Parity path: exact-length (un-bucketed) prefill + per-step decode with
    a host sync every step — mirrors the reference's deliberately-slow
    dynamic-cache parity mode (streaming.py:192-359).  Same math as the fast
    path, so token parity between the two is a correctness invariant
    (reference test layer 3, test_e2e_parity.py:914-1017)."""
    t0 = time.time()
    tth, tth_len = _pad_tth(trailing_text_hiddens, tts_pad_embed, bucketed=False)
    state = engine.prefill(talker_input_embeds, key, policy, bucketed=False)
    jax.block_until_ready(state["token"])
    t_prefill = time.time() - t0

    t1 = time.time()
    frames_list = []
    for _ in range(max_new_tokens):
        if int(state["token"][0]) == engine.eos_id:
            break
        if int(state["pos"]) >= engine.max_seq_len - 1:
            break
        state, frame = engine.decode_step(
            state, tth, tth_len, tts_pad_embed, policy, pred_policy
        )
        frames_list.append(np.asarray(frame))
    t_decode = time.time() - t1

    steps = len(frames_list)
    timing = {
        "prefill_ms": t_prefill * 1000,
        "decode_s": t_decode,
        "steps": steps,
        "ms_per_step": (t_decode / steps * 1000) if steps else 0.0,
        "steps_per_s": (steps / t_decode) if t_decode > 0 else 0.0,
    }
    if not frames_list:
        return None, timing
    return np.concatenate(frames_list, axis=0), timing
