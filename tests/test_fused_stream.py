"""Fused decode+vocode streaming (Engine.chunk_vocode +
loops.fast_generate_streaming_audio).

Contract (round 2, stateful vocoder): with the same PRNG key the fused
program yields the SAME codec frames as loops.fast_generate_streaming, and
its audio is SAMPLE-EXACT vs a FULL vocoder decode of those frames — the
codec streaming state (models/codec.py:decode_stream) carries conv tails +
attention windows, so chunked decode equals the unchunked one by linearity/
causality, with no receptive-field caveat (unlike the 25-frame window
StreamDecoder, which under-covers the pre-transformer's sliding window).
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


def _collect_frames(engine, embeds, tth, tpe, key, chunk_size=4,
                    first_chunks=(), max_new_tokens=14):
    frames = []
    for chunk, _t in loops.fast_generate_streaming(
        engine, embeds, tth, tpe, key=key, max_new_tokens=max_new_tokens,
        policy=GenerationPolicy(), pred_policy=SamplingPolicy(),
        chunk_size=chunk_size, first_chunks=first_chunks,
    ):
        frames.append(chunk)
    return frames


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


@pytest.mark.parametrize("ramp", [(), (2,)])
def test_fused_stream_audio_exact_vs_full_decode(tiny_engine, tiny_vocoder,
                                                 prompt_inputs, ramp):
    embeds, tth, tpe = prompt_inputs
    key = jax.random.PRNGKey(42)
    want_frames = _collect_frames(tiny_engine, embeds, tth, tpe, key,
                                  first_chunks=ramp)
    got_frames, audio = _collect_fused(tiny_engine, tiny_vocoder, embeds, tth,
                                       tpe, key, first_chunks=ramp)
    np.testing.assert_array_equal(np.concatenate(want_frames),
                                  np.concatenate(got_frames))
    allf = np.concatenate(got_frames)
    full = tiny_vocoder.decode(allf)
    stream = np.concatenate(audio)
    assert stream.shape == full.shape
    np.testing.assert_allclose(stream, full, atol=1e-5)
    assert stream.shape[0] == allf.shape[0] * tiny_vocoder.spf


def test_fused_stream_icl_priming_exact(tiny_engine, tiny_vocoder,
                                        prompt_inputs):
    """ref_codes prime the codec stream state: the streamed audio equals the
    full decode of [ref_codes, generated frames] minus the ref portion."""
    embeds, tth, tpe = prompt_inputs
    key = jax.random.PRNGKey(7)
    NQ = tiny_vocoder.cfg.num_quantizers
    ref_codes = np.random.RandomState(0).randint(
        0, tiny_vocoder.cfg.codebook_size, size=(9, NQ)).astype(np.int32)
    frames, audio = _collect_fused(tiny_engine, tiny_vocoder, embeds, tth,
                                   tpe, key, ref_codes=ref_codes)
    allf = np.concatenate(frames)
    combined = np.concatenate([ref_codes, allf])
    full = tiny_vocoder.decode(combined)
    stream = np.concatenate(audio)
    np.testing.assert_allclose(
        stream, full[len(ref_codes) * tiny_vocoder.spf:], atol=1e-5)


def test_fused_stream_kv_quant_engine(tiny_cfg, tiny_models, tiny_vocoder,
                                      prompt_inputs):
    """The fused chunk+vocode program runs on an int8-KV engine; audio stays
    exact vs the full decode of its own frames."""
    from qwen3tts_tpu.runtime.engine import Engine

    tp, tpp = tiny_models
    engine = Engine(tp, tpp, tiny_cfg, max_seq_len=64, kv_quant=True)
    embeds, tth, tpe = prompt_inputs
    key = jax.random.PRNGKey(11)
    frames, audio = _collect_fused(engine, tiny_vocoder, embeds, tth, tpe, key)
    allf = np.concatenate(frames)
    np.testing.assert_allclose(np.concatenate(audio),
                               tiny_vocoder.decode(allf), atol=1e-5)


@pytest.mark.slow
def test_codec_decode_stream_exact(tiny_cfg):
    """Direct decode_stream chaining == full decode, uneven chunks, nonzero
    biases (perturbed like tests/test_codec.py's pad guard)."""
    cfg = tiny_cfg.codec
    params = codec_lib.init_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    # perturb biases so state/pad bugs can't hide behind zeros
    params = jax.tree.map(
        lambda a: a + 0.05 if a.ndim == 1 and a.dtype == jnp.float32 else a,
        params)
    T = 17
    codes = jax.random.randint(jax.random.PRNGKey(4),
                               (1, T, cfg.num_quantizers), 0,
                               cfg.codebook_size)
    full = np.asarray(codec_lib.decode(params, cfg, codes))
    st = codec_lib.stream_init(params, cfg, 1)
    outs, i = [], 0
    for n in (1, 4, 2, 5, 5):
        w, st = codec_lib.decode_stream(params, cfg, st, codes[:, i:i + n])
        outs.append(np.asarray(w))
        i += n
    # 1e-4: conv VALID-vs-padded lowering reorders f32 accumulation; a state
    # bug would show O(1) errors (on [-1, 1] audio), not 1e-5-scale rounding
    np.testing.assert_allclose(np.concatenate(outs, axis=1), full, atol=1e-4)


def test_host_stateful_stream_decoder(tiny_vocoder):
    """StatefulStreamDecoder.feed with arbitrary feed sizes == full decode."""
    NQ = tiny_vocoder.cfg.num_quantizers
    codes = np.random.RandomState(5).randint(
        0, tiny_vocoder.cfg.codebook_size, size=(23, NQ)).astype(np.int32)
    sd = tiny_vocoder.stateful_stream_decoder()
    outs = []
    i = 0
    for n in (7, 1, 8, 5, 2):
        outs.append(sd.feed(codes[i:i + n]))
        i += n
    full = tiny_vocoder.decode(codes)
    np.testing.assert_allclose(np.concatenate(outs), full, atol=1e-5)


def test_pcm16_wire_parity(tiny_cfg, tiny_models, tiny_vocoder,
                           prompt_inputs):
    """``chunk_vocode_batched(pcm16=True)`` changes ONLY the wire encoding:
    identical engine state must yield byte-identical frames (the device-side
    PCM16 quantization sits strictly after the vocoder, so decode math is
    untouched) and audio equal to the f32 program within one quantization
    step.  This is the serving fetch-bytes optimization
    (runtime/scheduler.py QWEN3TTS_SERVE_PCM16)."""
    from qwen3tts_tpu.runtime.engine import Engine, make_knobs

    tp, pp = tiny_models
    embeds, tth, tpe = prompt_inputs
    pol = GenerationPolicy(do_sample=False, min_new_tokens=100)
    ppol = SamplingPolicy(do_sample=False)
    knobs = make_knobs(pol, ppol)
    key = jax.random.PRNGKey(5)
    outs = {}
    for pcm16 in (False, True):
        eng = Engine(tp, pp, tiny_cfg, max_seq_len=64, batch=1)
        state = eng.prefill(embeds, key, pol)
        voc_state = tiny_vocoder.stream_state_batched(1)
        out = eng.chunk_vocode_batched(
            tiny_vocoder, state, tth, jnp.asarray([tth.shape[1]]), tpe,
            pol, ppol, 8, voc_state, knobs=knobs, pcm16=pcm16)
        outs[pcm16] = (np.asarray(out[1]), np.asarray(out[5]))

    frames_f32, audio_f32 = outs[False]
    frames_i16, audio_i16 = outs[True]
    np.testing.assert_array_equal(frames_f32, frames_i16)
    assert audio_f32.dtype == np.float32 and audio_i16.dtype == np.int16
    # dequant exactly as the scheduler's host side does (scheduler.py)
    dq = audio_i16.astype(np.float32) / 32767.0
    clipped = np.clip(audio_f32, -32768.0 / 32767.0, 1.0)
    np.testing.assert_allclose(dq, clipped, atol=1.0 / 32767)
