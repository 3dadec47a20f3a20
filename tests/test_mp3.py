"""MP3 encode/decode binding tests (audio/mp3.py — libmp3lame/libmpg123).

Round-trips a known waveform through the streaming encoder and the mpg123
decoder and asserts the audio survives — the verification layer behind the
OpenAI server's ``response_format="mp3"`` (reference
examples/openai_server.py:242-256 offers mp3 via pydub; here it is a direct
system-library binding)."""
import numpy as np
import pytest

from qwen3tts_tpu.audio import mp3

pytestmark = pytest.mark.skipif(
    not (mp3.is_available() and mp3.decode_available()),
    reason="libmp3lame/libmpg123 not present")

SR = 24_000


def _sine(freq=440.0, secs=1.0, sr=SR):
    t = np.arange(int(sr * secs)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_roundtrip_one_shot():
    src = _sine()
    data = mp3.encode_mp3(src, SR, bitrate=128)
    assert len(data) > 1000  # ~1 s at 128 kbps ≈ 16 KB
    dec, sr = mp3.decode_mp3(data)
    assert sr == SR
    # mp3 adds codec delay padding; correlate to find the alignment and
    # assert the decoded signal is the source to within codec loss.
    assert len(dec) >= len(src)
    best = max(range(0, len(dec) - len(src) + 1, 16),
               key=lambda off: float(np.dot(dec[off:off + len(src)], src)))
    seg = dec[best:best + len(src)]
    corr = float(np.dot(seg, src) / (np.linalg.norm(seg) * np.linalg.norm(src)))
    assert corr > 0.97


def test_streaming_chunks_equals_one_shot_decodable():
    src = _sine(freq=220.0, secs=0.5)
    enc = mp3.Mp3Encoder(SR, bitrate=96)
    parts = []
    for i in range(0, len(src), 1777):  # odd chunk size, crosses frames
        parts.append(enc.encode(src[i:i + 1777]))
    parts.append(enc.flush())
    data = b"".join(parts)
    assert sum(map(len, parts[:-1])) > 0  # bytes flowed before flush
    dec, sr = mp3.decode_mp3(data)
    assert sr == SR and len(dec) >= len(src)
    assert float(np.max(np.abs(dec))) > 0.2  # not silence


def test_int16_input_accepted():
    src = (_sine(secs=0.2) * 32767).astype(np.int16)
    data = mp3.encode_mp3(src, SR)
    dec, _ = mp3.decode_mp3(data)
    assert float(np.max(np.abs(dec))) > 0.2


def test_encoder_closed_after_flush():
    enc = mp3.Mp3Encoder(SR)
    enc.encode(_sine(secs=0.1))
    enc.flush()
    assert enc.flush() == b""
    with pytest.raises(RuntimeError):
        enc.encode(_sine(secs=0.1))
