"""Int8 weight-only quantization tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.ops.quant import (
    dequant_matmul, is_quantized, maybe_matmul, quantize_bundle, quantize_tensor,
)


def test_quantize_tensor_accuracy():
    w = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 32)) * 0.1
    qw = quantize_tensor(w)
    assert qw["q"].dtype == jnp.int8
    deq = qw["q"].astype(jnp.float32) * qw["scale"]
    rel = float(jnp.abs(deq - w).max() / jnp.abs(w).max())
    assert rel < 0.01  # int8 per-channel: <1% of max


def test_dequant_matmul_close():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 64))
    exact = x @ w
    approx = dequant_matmul(x, quantize_tensor(w))
    err = float(jnp.abs(exact - approx).max())
    assert err < 0.05 * float(jnp.abs(exact).max()) + 1e-3


def test_maybe_matmul_passthrough():
    w = jnp.ones((4, 4))
    x = jnp.ones((2, 4))
    np.testing.assert_allclose(np.asarray(maybe_matmul(x, w)),
                               np.asarray(x @ w))
    assert is_quantized(quantize_tensor(w))
    assert not is_quantized(w)


@pytest.mark.slow
def test_quantized_bundle_generates(tiny_cfg, ref_wav):
    from qwen3tts_tpu import FasterQwen3TTS

    m = FasterQwen3TTS.from_pretrained("random:tiny", quantize="int8")
    blocks = m.params["talker"]["blocks"]
    assert is_quantized(blocks["qkv_proj"])
    assert not is_quantized(blocks["input_norm"])
    audio_list, sr = m.generate_voice_clone(
        "Quantized.", "English", ref_wav, "r", max_new_tokens=6)
    assert len(audio_list[0]) % 2000 == 0
    assert np.isfinite(audio_list[0]).all()


def test_unknown_quantize_mode_errors():
    import pytest

    from qwen3tts_tpu import FasterQwen3TTS

    with pytest.raises(ValueError, match="quantize"):
        FasterQwen3TTS.from_pretrained("random:tiny", quantize="fp4")


def test_w8a8_matmul_close():
    from qwen3tts_tpu.ops.quant import w8a8_matmul

    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 64))
    exact = x @ w
    approx = w8a8_matmul(x, quantize_tensor(w, "w8a8"))
    err = float(jnp.abs(exact - approx).max())
    # two int8 quantizations stack: allow ~2x the weight-only tolerance
    assert err < 0.1 * float(jnp.abs(exact).max()) + 1e-3


def test_w8a8_maybe_matmul_dispatch():
    from qwen3tts_tpu.ops.quant import w8a8_matmul

    w = jax.random.normal(jax.random.PRNGKey(2), (16, 8)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16))
    qw = quantize_tensor(w, "w8a8")
    assert is_quantized(qw) and "q8" in qw
    np.testing.assert_allclose(np.asarray(maybe_matmul(x, qw)),
                               np.asarray(w8a8_matmul(x, qw)))


@pytest.mark.slow
def test_w8a8_bundle_generates(tiny_cfg, ref_wav):
    from qwen3tts_tpu import FasterQwen3TTS

    m = FasterQwen3TTS.from_pretrained("random:tiny", quantize="w8a8")
    blocks = m.params["talker"]["blocks"]
    assert is_quantized(blocks["qkv_proj"]) and "q8" in blocks["qkv_proj"]
    # lm_heads stay weight-only even in w8a8 (logits feed sampling)
    assert "q" in m.params["predictor"]["lm_heads"]
    audio_list, sr = m.generate_voice_clone(
        "Quantized.", "English", ref_wav, "r", max_new_tokens=6)
    assert len(audio_list[0]) % 2000 == 0
    assert np.isfinite(audio_list[0]).all()


@pytest.mark.slow
def test_selective_predictor_quant(tiny_cfg, ref_wav):
    """quantize="int8-predictor" quantizes ONLY the predictor stack: the
    talker (codebook-0 semantics) stays full precision, and generation
    runs end-to-end through the fused streaming path."""
    from qwen3tts_tpu import FasterQwen3TTS
    from qwen3tts_tpu.ops.quant import parse_mode

    assert parse_mode("int8-predictor") == ("int8", ("predictor",))
    assert parse_mode("w8a8-talker") == ("w8a8", ("talker",))

    m = FasterQwen3TTS.from_pretrained("random:tiny", quantize="int8-predictor")
    assert not is_quantized(m.params["talker"]["blocks"]["qkv_proj"])
    assert is_quantized(m.params["predictor"]["blocks"]["qkv_proj"])
    assert is_quantized(m.params["predictor"]["lm_heads"])
    audio_list, sr = m.generate_voice_clone(
        "Selective.", "English", ref_wav, "r", max_new_tokens=6)
    assert len(audio_list[0]) % 2000 == 0
    assert np.isfinite(audio_list[0]).all()
    chunks = [a for a, _, _ in m.generate_voice_clone_streaming(
        "Selective.", "English", ref_wav, "r", max_new_tokens=8, chunk_size=4)]
    assert all(np.isfinite(a).all() for a in chunks)


def test_selective_talker_quant_leaves_predictor(tiny_cfg):
    from qwen3tts_tpu.core.loader import load_pretrained

    _, params = load_pretrained("random:tiny")
    out = quantize_bundle(params, "w8a8-talker")
    assert is_quantized(out["talker"]["blocks"]["qkv_proj"])
    assert "q8" in out["talker"]["blocks"]["qkv_proj"]
    assert not is_quantized(out["predictor"]["blocks"]["qkv_proj"])
    assert not is_quantized(out["predictor"]["lm_heads"])


@pytest.mark.slow
def test_int8_plus_kv_quant_streams(tiny_cfg, ref_wav):
    """Full API with BOTH int8 weights and the int8 KV cache: non-streaming
    and fused-streaming generation produce finite, frame-aligned audio
    (covers the kv_quant plumb through from_pretrained → Engine → the
    fused chunk+vocode program)."""
    import numpy as np

    from qwen3tts_tpu import FasterQwen3TTS

    m = FasterQwen3TTS.from_pretrained("random:tiny", quantize="int8",
                                       kv_quant=True)
    assert m.engine.kv_quant
    audio_list, sr = m.generate_voice_clone(
        "Quantized everything.", "English", ref_wav, "r", max_new_tokens=6)
    assert np.isfinite(audio_list[0]).all()
    chunks = [a for a, _, _ in m.generate_voice_clone_streaming(
        "Quantized everything.", "English", ref_wav, "r",
        max_new_tokens=8, chunk_size=4)]
    total = sum(len(a) for a in chunks)
    assert total % 2000 == 0 and total > 0
    assert all(np.isfinite(a).all() for a in chunks)
