"""End-to-end API tests on the tiny preset (structural layer — reference
TestBF16Parity's shape/validity assertions, test_e2e_parity.py:583-911)."""
import numpy as np
import pytest

from qwen3tts_tpu import FasterQwen3TTS


@pytest.mark.slow
def test_voice_clone_nonstreaming(tiny_tts, ref_wav):
    audio_list, sr = tiny_tts.generate_voice_clone(
        "Hello world.", "English", ref_wav, "ref", max_new_tokens=12)
    a = audio_list[0]
    assert sr == 24_000
    assert len(a) > 0 and len(a) % 2000 == 0
    assert np.abs(a).max() <= 1.0


def test_voice_clone_streaming_chunks(tiny_tts, ref_wav):
    chunks = list(tiny_tts.generate_voice_clone_streaming(
        "Hello again.", "English", ref_wav, "ref",
        max_new_tokens=16, chunk_size=4))
    assert len(chunks) >= 2
    for audio, sr, timing in chunks:
        assert sr == 24_000
        assert timing["chunk_steps"] * 2000 == len(audio)
    assert chunks[-1][2]["is_final"]


def test_icl_mode_trims_reference(tiny_tts, ref_wav):
    audio_list, sr = tiny_tts.generate_voice_clone(
        "ICL.", "English", ref_wav, "ref transcript",
        xvec_only=False, max_new_tokens=8)
    # output contains only generated frames (ref trimmed exactly)
    assert len(audio_list[0]) % 2000 == 0
    assert len(audio_list[0]) <= 8 * 2000


def test_parity_mode_runs(tiny_tts, ref_wav):
    audio_list, sr = tiny_tts.generate_voice_clone(
        "Parity.", "English", ref_wav, "ref", max_new_tokens=6, parity_mode=True)
    assert len(audio_list[0]) % 2000 == 0


def test_voice_prompt_cache(tiny_tts, ref_wav):
    tiny_tts._voice_prompt_cache.clear()
    tiny_tts.generate_voice_clone("One.", "English", ref_wav, "r", max_new_tokens=4)
    assert len(tiny_tts._voice_prompt_cache) == 1
    tiny_tts.generate_voice_clone("Two.", "English", ref_wav, "r", max_new_tokens=4)
    assert len(tiny_tts._voice_prompt_cache) == 1  # hit, not re-encode


def test_speaker_embedding_extraction(tiny_tts, ref_wav):
    emb = tiny_tts.extract_speaker_embedding(ref_wav)
    assert emb.shape == (tiny_tts.cfg.speaker_encoder.emb_dim,)
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, atol=1e-3)


@pytest.mark.slow
def test_custom_voice_guard_and_run(ref_wav):
    m = FasterQwen3TTS.from_pretrained("random:tiny-custom")
    with pytest.raises(ValueError):
        m.generate_voice_design("x", "warm", "English")
    audio_list, sr = m.generate_custom_voice(
        "Custom.", "vivian", "English", max_new_tokens=6)
    assert len(audio_list[0]) % 2000 == 0


@pytest.mark.slow
def test_voice_design_guard_and_run():
    m = FasterQwen3TTS.from_pretrained("random:tiny-design")
    with pytest.raises(ValueError):
        m.generate_custom_voice("x", "vivian", "English")
    audio_list, sr = m.generate_voice_design(
        "Design.", "A warm, low voice.", "English", max_new_tokens=6)
    assert len(audio_list[0]) % 2000 == 0


def test_base_model_rejects_custom(tiny_tts):
    with pytest.raises(ValueError):
        tiny_tts.generate_custom_voice("x", "vivian", "English")


def test_longform_split_and_generate(tiny_tts, ref_wav):
    from qwen3tts_tpu.api.longform import generate_longform, split_sentences

    groups = split_sentences("One. Two! Three? " + "x" * 500 + ". Tail", max_chars=100)
    assert all(len(g) <= 101 for g in groups)
    assert len(groups) >= 6

    wav, sr = generate_longform(
        tiny_tts, "First sentence. Second sentence.", "English", ref_wav, "r",
        max_chars=20, max_new_tokens=4, gap_ms=50)
    assert sr == 24_000
    # two segments + one gap
    assert len(wav) >= 2 * 4 * 2000 + int(0.05 * sr)


def test_longform_cross_segment_conditioning(tiny_tts, ref_wav):
    """condition_on_previous=True: segment 2+ uses the previous segment's
    (audio, transcript) as a full-ICL reference — prosody continuity across
    sentence boundaries (TODO r1 quality item)."""
    from qwen3tts_tpu.api.longform import generate_longform

    n_prompts_before = len(tiny_tts._voice_prompt_cache)
    wav, sr = generate_longform(
        tiny_tts, "First sentence. Second sentence.", "English", ref_wav, "r",
        max_chars=20, max_new_tokens=4, gap_ms=50, condition_on_previous=True)
    assert len(wav) >= 2 * 4 * 2000
    # segment 2 created an ICL prompt keyed on segment 1's generated audio
    new_keys = list(tiny_tts._voice_prompt_cache)[n_prompts_before:]
    assert any(len(k[0]) == 40 and not k[2] for k in new_keys)  # sha1 key, icl


def test_longform_streaming_segments(tiny_tts, ref_wav):
    from qwen3tts_tpu.api.longform import generate_longform_streaming

    chunks = list(generate_longform_streaming(
        tiny_tts, "Seg one. Seg two.", "English", ref_wav, "r",
        max_chars=10, chunk_size=4, max_new_tokens=4, gap_ms=40))
    segs = {c[2]["segment"] for c in chunks}
    assert segs == {0, 1}
    assert any(c[2].get("is_gap") for c in chunks)
