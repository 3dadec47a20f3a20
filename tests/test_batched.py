"""Batched (B>1) decode: the throughput-per-chip mode the reference lacks.

Correctness contract: each batch row produces EXACTLY the tokens its
single-run (batch-1) counterpart produces under greedy decoding — per-row
left-pad masks, RoPE offsets, repetition-penalty history and EOS freezing
are all per-row."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.models.predictor import SamplingPolicy
from qwen3tts_tpu.runtime import loops
from qwen3tts_tpu.runtime.engine import Engine, GenerationPolicy

GPOL = GenerationPolicy(do_sample=False, repetition_penalty=1.05, min_new_tokens=0)
GPPOL = SamplingPolicy(do_sample=False)
KEY = jax.random.PRNGKey(11)


@pytest.fixture(scope="module")
def rows(tiny_cfg):
    H = tiny_cfg.talker.hidden_size
    lengths = [6, 10, 8]
    embeds = [jax.random.normal(jax.random.PRNGKey(40 + i), (1, L, H), jnp.float32) * 0.1
              for i, L in enumerate(lengths)]
    tths = [jax.random.normal(jax.random.PRNGKey(50 + i), (1, 4, H), jnp.float32) * 0.1
            for i in range(3)]
    tpe = jnp.zeros((1, 1, H), jnp.float32)
    return embeds, tths, tpe


def _stack_left_pad(embeds, tpe_row):
    """Left-pad rows to the max length and stack; returns (batch, pad_count)."""
    H = embeds[0].shape[2]
    T = max(e.shape[1] for e in embeds)
    out, pads = [], []
    for e in embeds:
        pad = T - e.shape[1]
        pads.append(pad)
        out.append(jnp.concatenate(
            [jnp.zeros((1, pad, H), e.dtype), e], axis=1))
    return jnp.concatenate(out, axis=0), np.asarray(pads, np.int32)


def _singles(tiny_models, tiny_cfg, rows, max_new, eos_id=None):
    tp, pp = tiny_models
    outs = []
    for e, t in zip(rows[0], rows[1]):
        eng = Engine(tp, pp, tiny_cfg, max_seq_len=64)
        if eos_id is not None:
            eng.eos_id = eos_id
        ids, _ = loops.fast_generate(
            eng, e, t, rows[2], key=KEY, max_new_tokens=max_new,
            policy=GPOL, pred_policy=GPPOL, device_chunk=4)
        outs.append(ids)
    return outs


def test_batched_rows_match_single_runs(tiny_models, tiny_cfg, rows):
    tp, pp = tiny_models
    embeds, tths, tpe = rows
    batch_e, pads = _stack_left_pad(embeds, tpe)
    batch_t = jnp.concatenate(tths, axis=0)
    batch_tpe = jnp.broadcast_to(tpe, (3, 1, tpe.shape[2]))

    engB = Engine(tp, pp, tiny_cfg, max_seq_len=64, batch=3)
    outs, timing = loops.fast_generate_batch(
        engB, batch_e, batch_t, batch_tpe, key=KEY, pad_count=pads,
        max_new_tokens=8, policy=GPOL, pred_policy=GPPOL, device_chunk=4)
    assert timing["batch"] == 3
    singles = _singles(tiny_models, tiny_cfg, rows, 8)
    for b in range(3):
        np.testing.assert_array_equal(outs[b], singles[b], err_msg=f"row {b}")


def test_api_batch_generate(tiny_tts, ref_wav):
    """generate_voice_clone_batch returns one waveform per text with exact
    frame→sample accounting."""
    wavs, sr = tiny_tts.generate_voice_clone_batch(
        ["first utterance", "a second much longer utterance to vary length"],
        "english", ref_wav, "ref", max_new_tokens=6)
    assert len(wavs) == 2 and sr == 24_000
    for w in wavs:
        assert len(w) == 6 * 2000  # budget-truncated: 6 frames exactly


def test_batched_eos_freezes_row(tiny_models, tiny_cfg, rows):
    """Force one row to hit EOS early (by declaring one of its greedy tokens
    as the EOS id): that row must stop at the same step as its single run,
    while the other rows continue to full budget."""
    tp, pp = tiny_models
    embeds, tths, tpe = rows
    base = _singles(tiny_models, tiny_cfg, rows, 8)
    eos = int(base[1][2, 0])  # row 1's step-2 codebook-0 token becomes "EOS"

    singles = _singles(tiny_models, tiny_cfg, rows, 8, eos_id=eos)
    batch_e, pads = _stack_left_pad(embeds, tpe)
    batch_t = jnp.concatenate(tths, axis=0)
    batch_tpe = jnp.broadcast_to(tpe, (3, 1, tpe.shape[2]))
    engB = Engine(tp, pp, tiny_cfg, max_seq_len=64, batch=3)
    engB.eos_id = eos
    outs, _ = loops.fast_generate_batch(
        engB, batch_e, batch_t, batch_tpe, key=KEY, pad_count=pads,
        max_new_tokens=8, policy=GPOL, pred_policy=GPPOL, device_chunk=4)
    lengths = [o.shape[0] for o in outs]
    assert lengths == [s.shape[0] for s in singles]
    assert min(lengths) < max(lengths)  # at least one row froze early
    for b in range(3):
        np.testing.assert_array_equal(outs[b], singles[b], err_msg=f"row {b}")
