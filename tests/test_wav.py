"""WAV I/O tests."""
import numpy as np
import pytest

from qwen3tts_tpu.audio.wav import (
    read_wav, resample, to_pcm16, wav_header, write_wav,
)


def test_write_read_roundtrip(tmp_path):
    sr = 24_000
    wav = (0.5 * np.sin(np.linspace(0, 100, 4800))).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, wav, sr)
    back, sr2 = read_wav(p)
    assert sr2 == sr
    np.testing.assert_allclose(back, wav, atol=2.0 / 32767)  # PCM16 rounding


def test_streaming_header_unknown_length():
    h = wav_header(24_000)
    assert h[:4] == b"RIFF" and h[8:12] == b"WAVE"
    assert h[4:8] == b"\xff\xff\xff\xff"  # unknown size (openai_server.py:96-112)
    assert len(h) == 44


def test_pcm16():
    b = to_pcm16(np.array([0.0, 1.0, -1.0], np.float32))
    assert np.frombuffer(b, "<i2").tolist() == [0, 32767, -32767]


def test_resample_lengths():
    wav = np.zeros(24_000, np.float32)
    assert abs(len(resample(wav, 24_000, 16_000)) - 16_000) <= 1
    assert resample(wav, 24_000, 24_000) is wav


def test_read_stereo_mixdown(tmp_path):
    import wave
    sr = 8000
    left = (np.ones(100) * 0.5 * 32767).astype("<i2")
    right = (np.ones(100) * -0.5 * 32767).astype("<i2")
    inter = np.empty(200, "<i2")
    inter[0::2], inter[1::2] = left, right
    p = tmp_path / "st.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(2); w.setsampwidth(2); w.setframerate(sr)
        w.writeframes(inter.tobytes())
    mono, _ = read_wav(p)
    assert mono.shape == (100,)
    np.testing.assert_allclose(mono, 0.0, atol=1e-4)
