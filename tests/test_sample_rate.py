"""Sample-rate inference chain (reference tests/test_sample_rate.py)."""
import types

from qwen3tts_tpu.api.model import _infer_sample_rate


def test_codec_rate_wins():
    codec = types.SimpleNamespace(sample_rate=22_050)
    model = types.SimpleNamespace(sample_rate=48_000)
    assert _infer_sample_rate(codec, model) == 22_050


def test_model_rate_fallback():
    codec = types.SimpleNamespace(sample_rate=None)
    model = types.SimpleNamespace(sample_rate=48_000)
    assert _infer_sample_rate(codec, model) == 48_000


def test_default_24k():
    codec = types.SimpleNamespace(sample_rate=None)
    model = types.SimpleNamespace(sample_rate=None)
    assert _infer_sample_rate(codec, model) == 24_000


def test_preset_is_24k():
    from qwen3tts_tpu.core.presets import get_preset

    cfg = get_preset("tiny")
    assert _infer_sample_rate(cfg.codec, cfg) == 24_000
