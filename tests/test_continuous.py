"""Continuous batching: rows join a RUNNING batch at chunk boundaries
(Engine.join_row) and must generate exactly what a fresh batch-1 run would.

This is the engine-level contract behind serving-level continuous batching
(runtime/scheduler.py) — a throughput mode the reference cannot express
(strictly batch-1, SURVEY §2.4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.models.predictor import SamplingPolicy
from qwen3tts_tpu.runtime import loops
from qwen3tts_tpu.runtime.engine import Engine, GenerationPolicy, make_knobs

GPOL = GenerationPolicy(do_sample=False, repetition_penalty=1.05, min_new_tokens=2)
GPPOL = SamplingPolicy(do_sample=False)
KEY = jax.random.PRNGKey(3)


def _emb(key, T, H, scale=0.1):
    return jax.random.normal(key, (1, T, H), jnp.float32) * scale


def _single_run(tiny_models, tiny_cfg, embeds, tth, tpe, max_new):
    tp, pp = tiny_models
    eng = Engine(tp, pp, tiny_cfg, max_seq_len=128)
    ids, _ = loops.fast_generate(
        eng, embeds, tth, tpe, key=KEY, max_new_tokens=max_new,
        policy=GPOL, pred_policy=GPPOL, device_chunk=4)
    return np.asarray(ids)


def test_join_row_matches_single_run(tiny_models, tiny_cfg):
    tp, pp = tiny_models
    H = tiny_cfg.talker.hidden_size
    tpe1 = jnp.zeros((1, 1, H), jnp.float32)

    e0 = _emb(jax.random.PRNGKey(70), 6, H)
    e1 = _emb(jax.random.PRNGKey(71), 9, H)
    e_join = _emb(jax.random.PRNGKey(72), 7, H)
    tth0 = _emb(jax.random.PRNGKey(80), 4, H)
    tth1 = _emb(jax.random.PRNGKey(81), 3, H)
    tth_join = _emb(jax.random.PRNGKey(82), 5, H)

    # ---- reference outputs: fresh batch-1 runs
    want_join = _single_run(tiny_models, tiny_cfg, e_join, tth_join, tpe1, 20)

    # ---- batched engine: prefill rows 0+1, decode past pos>=32, then join
    eng = Engine(tp, pp, tiny_cfg, max_seq_len=128, batch=2)
    T = max(e0.shape[1], e1.shape[1])
    embeds = jnp.concatenate([
        jnp.concatenate([jnp.zeros((1, T - e0.shape[1], H)), e0], axis=1),
        jnp.concatenate([jnp.zeros((1, T - e1.shape[1], H)), e1], axis=1),
    ], axis=0)
    pads = np.asarray([T - e0.shape[1], 0], np.int32)
    Tt = max(tth0.shape[1], tth1.shape[1])
    tpe = jnp.zeros((2, 1, H), jnp.float32)
    tth = jnp.zeros((2, Tt, H), jnp.float32)
    tth = tth.at[0, : tth0.shape[1]].set(tth0[0]).at[1, : tth1.shape[1]].set(tth1[0])
    tth_lens = jnp.asarray([tth0.shape[1], tth1.shape[1]], jnp.int32)

    knobs = make_knobs(GPOL, GPPOL)
    state = eng.prefill(embeds, KEY, GPOL, pad_count=pads)
    pos = int(jax.device_get(state["pos"]))
    # decode until the shared position clears the smallest prefill bucket
    while pos < 32:
        state, frames, n, lens, done = eng.decode_chunk(
            state, tth, tth_lens, tpe, GPOL, GPPOL, 8, knobs=knobs)
        pos += int(jax.device_get(n))

    # row 1 "finishes"; admit the new request into it
    state = eng.join_row(state, 1, e_join, policy=GPOL, pred_policy=GPPOL,
                         pos_hint=pos)
    state["done"] = state["done"].at[0].set(True)  # retire row 0

    # each decode frame emits the CURRENT token (the join prefill's sample
    # shows up in the first chunk's first frame — same as fast_generate)
    got = []
    # follow with decode chunks, collecting row 1's first-codebook tokens
    tth2 = jnp.zeros((2, 8, H), jnp.float32)
    tth2 = tth2.at[1, : tth_join.shape[1]].set(tth_join[0])
    tth_lens2 = jnp.asarray([0, tth_join.shape[1]], jnp.int32)
    steps = 0
    while steps < 20:
        state, frames, n, lens, done = eng.decode_chunk(
            state, tth2, tth_lens2, tpe, GPOL, GPPOL, 4, knobs=knobs)
        f, l = jax.device_get((frames, lens))
        got.extend(f[1, : min(int(l[1]), 20 - steps), 0].tolist())
        steps += int(l[1])
        if bool(jax.device_get(done)):
            break

    got = np.asarray(got[: want_join.shape[0]])
    np.testing.assert_array_equal(got, want_join[: len(got), 0])
    assert len(got) >= min(20, want_join.shape[0]) - 1


def test_join_row_rejects_insufficient_position(tiny_models, tiny_cfg):
    tp, pp = tiny_models
    H = tiny_cfg.talker.hidden_size
    eng = Engine(tp, pp, tiny_cfg, max_seq_len=128, batch=2)
    e = _emb(jax.random.PRNGKey(90), 6, H)
    state = eng.prefill(jnp.concatenate([e, e], 0), KEY, GPOL)
    with pytest.raises(ValueError, match="cannot join"):
        eng.join_row(state, 1, e, policy=GPOL, pos_hint=8)
