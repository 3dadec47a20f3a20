"""Speaker encoder (x-vector) tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.models import speaker as S


@pytest.fixture(scope="module")
def spk(tiny_cfg):
    params = S.init_params(jax.random.PRNGKey(0), tiny_cfg.speaker_encoder)
    return params, tiny_cfg.speaker_encoder


def test_embed_shape_and_norm(spk):
    params, cfg = spk
    wav = jax.random.normal(jax.random.PRNGKey(1), (16_000,)) * 0.1
    emb = S.embed(params, cfg, wav)
    assert emb.shape == (cfg.emb_dim,)
    np.testing.assert_allclose(float(jnp.linalg.norm(emb)), 1.0, atol=1e-3)


def test_embed_deterministic_and_speaker_sensitive(spk):
    params, cfg = spk
    t = jnp.linspace(0, 1.0, 16_000)
    a = jnp.sin(2 * jnp.pi * 150 * t) * 0.3
    b = jnp.sin(2 * jnp.pi * 300 * t) * 0.3
    ea1 = np.asarray(S.embed(params, cfg, a))
    ea2 = np.asarray(S.embed(params, cfg, a))
    eb = np.asarray(S.embed(params, cfg, b))
    np.testing.assert_array_equal(ea1, ea2)  # deterministic
    assert float(np.dot(ea1, eb)) < 0.999  # different signals differ


def test_embed_short_audio(spk):
    """Sub-frame audio must not crash (padded to one frame)."""
    params, cfg = spk
    emb = S.embed(params, cfg, jnp.zeros((100,)))
    assert emb.shape == (cfg.emb_dim,)


def test_log_mel_shape():
    mel = S.log_mel(jnp.zeros((16_000,)), 20, 16_000)
    assert mel.shape[1] == 20
    assert mel.shape[0] == (16_000 - 400) // 160 + 1
