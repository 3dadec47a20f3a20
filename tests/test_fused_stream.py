"""Fused decode+vocode streaming (Engine.chunk_vocode +
loops.fast_generate_streaming_audio) vs the split path.

Contract: with the same PRNG key the fused program yields the SAME codec
frames as loops.fast_generate_streaming and the SAME audio samples as
feeding those frames through audio/vocoder.py:StreamDecoder — the window
layout ([valid ctx, chunk, right-pad]) is identical, so on one backend the
results are bit-comparable (tiny float tolerance for op-ordering).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.audio.vocoder import Vocoder
from qwen3tts_tpu.models import codec as codec_lib
from qwen3tts_tpu.runtime import loops
from qwen3tts_tpu.runtime.engine import GenerationPolicy
from qwen3tts_tpu.models.predictor import SamplingPolicy


@pytest.fixture(scope="module")
def tiny_vocoder(tiny_cfg):
    params = codec_lib.init_params(jax.random.PRNGKey(9), tiny_cfg.codec,
                                   jnp.float32)
    return Vocoder(params, tiny_cfg.codec, context_frames=5,
                   compute_dtype=jnp.float32)


def _collect_split(engine, vocoder, embeds, tth, tpe, key, ref_codes=None,
                   chunk_size=4, first_chunks=(), max_new_tokens=14):
    sd = vocoder.stream_decoder(chunk_size)
    if ref_codes is not None and len(ref_codes):
        sd.feed(np.asarray(ref_codes))
    frames, audio = [], []
    for chunk, _t in loops.fast_generate_streaming(
        engine, embeds, tth, tpe, key=key, max_new_tokens=max_new_tokens,
        policy=GenerationPolicy(), pred_policy=SamplingPolicy(),
        chunk_size=chunk_size, first_chunks=first_chunks,
    ):
        frames.append(chunk)
        audio.append(sd.feed(chunk))
    return frames, audio


def _collect_fused(engine, vocoder, embeds, tth, tpe, key, ref_codes=None,
                   chunk_size=4, first_chunks=(), max_new_tokens=14):
    frames, audio = [], []
    for chunk, aud, _t in loops.fast_generate_streaming_audio(
        engine, vocoder, embeds, tth, tpe, key=key,
        max_new_tokens=max_new_tokens, policy=GenerationPolicy(),
        pred_policy=SamplingPolicy(), chunk_size=chunk_size,
        first_chunks=first_chunks, ref_codes=ref_codes,
    ):
        frames.append(chunk)
        audio.append(aud)
    return frames, audio


def _compare(f1, a1, f2, a2, spf, chunk_size, first_chunks=()):
    np.testing.assert_array_equal(np.concatenate(f1), np.concatenate(f2))
    assert sum(a.shape[0] for a in a1) == sum(a.shape[0] for a in a2)
    sizes = list(first_chunks) + [chunk_size]
    for i, (c1, c2, fr) in enumerate(zip(a1, a2, f2)):
        assert c1.shape == c2.shape
        assert c2.shape[0] == fr.shape[0] * spf
        expected = sizes[min(i, len(sizes) - 1)]
        if fr.shape[0] == expected:
            # full chunk: identical window layout in both paths → identical
            # samples.  (A FINAL partial chunk is decoded by StreamDecoder
            # with extra borrowed context — both variants are exact given
            # context >= receptive field, but not bit-identical.)
            np.testing.assert_allclose(c1, c2, atol=1e-5,
                                       err_msg=f"chunk {i}")


@pytest.mark.parametrize("ramp", [(), (2,)])
def test_fused_stream_matches_split(tiny_engine, tiny_vocoder, prompt_inputs,
                                    ramp):
    embeds, tth, tpe = prompt_inputs
    key = jax.random.PRNGKey(42)
    f1, a1 = _collect_split(tiny_engine, tiny_vocoder, embeds, tth, tpe, key,
                            first_chunks=ramp)
    f2, a2 = _collect_fused(tiny_engine, tiny_vocoder, embeds, tth, tpe, key,
                            first_chunks=ramp)
    _compare(f1, a1, f2, a2, tiny_vocoder.spf, 4, ramp)


def test_fused_stream_kv_quant_engine(tiny_cfg, tiny_models, tiny_vocoder,
                                      prompt_inputs):
    """The fused chunk+vocode program runs on an int8-KV engine and matches
    its own split path (quantized cache used identically by both)."""
    from qwen3tts_tpu.runtime.engine import Engine

    tp, tpp = tiny_models
    engine = Engine(tp, tpp, tiny_cfg, max_seq_len=64, kv_quant=True)
    embeds, tth, tpe = prompt_inputs
    key = jax.random.PRNGKey(11)
    f1, a1 = _collect_split(engine, tiny_vocoder, embeds, tth, tpe, key)
    f2, a2 = _collect_fused(engine, tiny_vocoder, embeds, tth, tpe, key)
    _compare(f1, a1, f2, a2, tiny_vocoder.spf, 4)


def test_fused_stream_icl_priming(tiny_engine, tiny_vocoder, prompt_inputs):
    """ref_codes prime the sliding context identically to StreamDecoder."""
    embeds, tth, tpe = prompt_inputs
    key = jax.random.PRNGKey(7)
    NQ = tiny_vocoder.cfg.num_quantizers
    ref_codes = np.random.RandomState(0).randint(
        0, tiny_vocoder.cfg.codebook_size, size=(9, NQ)).astype(np.int32)
    f1, a1 = _collect_split(tiny_engine, tiny_vocoder, embeds, tth, tpe, key,
                            ref_codes=ref_codes)
    f2, a2 = _collect_fused(tiny_engine, tiny_vocoder, embeds, tth, tpe, key,
                            ref_codes=ref_codes)
    _compare(f1, a1, f2, a2, tiny_vocoder.spf, 4)
