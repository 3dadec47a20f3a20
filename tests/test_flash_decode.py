"""Pallas flash-decode kernel vs pure-jnp oracle (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.ops.flash_decode import flash_decode, flash_decode_reference


@pytest.mark.parametrize("pos,pad", [(0, 0), (7, 0), (130, 5), (255, 31)])
def test_matches_oracle(pos, pad):
    S, KVH, D, NH = 256, 2, 32, 4
    q = jax.random.normal(jax.random.PRNGKey(0), (NH, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (S, KVH, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (S, KVH, D), jnp.float32)
    out = flash_decode(q, k, v, jnp.int32(pos), jnp.int32(pad),
                       block_size=64, interpret=True)
    ref = flash_decode_reference(q, k, v, pos, pad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sliding_window():
    S, KVH, D, NH = 256, 2, 32, 4
    q = jax.random.normal(jax.random.PRNGKey(0), (NH, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (S, KVH, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (S, KVH, D), jnp.float32)
    out = flash_decode(q, k, v, jnp.int32(200), jnp.int32(0),
                       block_size=64, sliding_window=48, interpret=True)
    ref = flash_decode_reference(q, k, v, 200, 0, sliding_window=48)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_dynamic_trip_count_independent_of_tail():
    """Garbage beyond pos must not affect the result (only the live prefix
    is ever read)."""
    S, KVH, D, NH = 256, 2, 32, 4
    q = jax.random.normal(jax.random.PRNGKey(0), (NH, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (S, KVH, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (S, KVH, D), jnp.float32)
    k_dirty = k.at[100:].set(jnp.nan)
    v_dirty = v.at[100:].set(jnp.inf)
    out = flash_decode(q, k_dirty, v_dirty, jnp.int32(63), jnp.int32(0),
                       block_size=64, interpret=True)
    ref = flash_decode_reference(q, k, v, 63, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_batched_rows_match_per_row_oracle():
    import jax

    from qwen3tts_tpu.ops.flash_decode import flash_decode_batched

    B, S, KVH, G, D = 3, 256, 2, 4, 64
    NH = KVH * G
    q = jax.random.normal(jax.random.PRNGKey(0), (B, NH, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, KVH, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, KVH, D), jnp.float32)
    pos = 120
    pads = jnp.asarray([0, 37, 100], jnp.int32)  # incl. a joined-row-style pad
    out = flash_decode_batched(q, k, v, jnp.int32(pos), pads, block_size=64)
    for b in range(B):
        ref = flash_decode_reference(q[b], k[b], v[b], pos, int(pads[b]))
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_batched_fully_padded_row_is_finite():
    import jax

    from qwen3tts_tpu.ops.flash_decode import flash_decode_batched

    B, S, KVH, G, D = 2, 128, 2, 2, 64
    NH = KVH * G
    q = jax.random.normal(jax.random.PRNGKey(0), (B, NH, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, KVH, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, KVH, D), jnp.float32)
    # row 1 has pad > pos: zero live slots — its lane must not NaN
    out = flash_decode_batched(q, k, v, jnp.int32(10), jnp.asarray([0, 64]),
                               block_size=64)
    assert np.isfinite(np.asarray(out)).all()


def test_pad_beyond_pos_row_is_zero_and_starts_no_dma():
    """A row whose pad exceeds pos has i0 >= nb: the kernel must not start
    its pipeline-warmup DMA (un-waited DMA semaphores hard-abort real TPUs —
    this was the ContinuousBatcher.warmup 'TPU backend error (Aborted)'),
    and the row's output is exactly zero while live rows stay correct."""
    from qwen3tts_tpu.ops.flash_decode import (flash_decode_batched,
                                               flash_decode_reference)

    B, S, KVH, G, D = 3, 256, 2, 2, 64
    NH = KVH * G
    q = jax.random.normal(jax.random.PRNGKey(0), (B, NH, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, KVH, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, KVH, D), jnp.float32)
    pos, pads = 33, [0, 200, 5]  # row 1 mis-joined: pad 200 > pos 33
    out = np.asarray(flash_decode_batched(
        q, k, v, jnp.int32(pos), jnp.asarray(pads), block_size=64))
    assert np.allclose(out[1], 0.0)
    for b in (0, 2):
        ref = flash_decode_reference(q[b], k[b], v[b], pos, pads[b])
        np.testing.assert_allclose(out[b], np.asarray(ref), atol=1e-5)


def test_mixed_sliding_stack_flash_matches_masked():
    """Mixed ``layer_types`` stack (upstream Qwen3 carries sliding_attention
    layers; reference talker_graph.py:76, predictor_graph.py:96-104): the
    flash path conds per layer between a windowed and a full kernel variant
    (models/layers.py block_forward) — it must match the masked-XLA path
    exactly, and the sliding layers must actually bite."""
    from qwen3tts_tpu.core.config import TalkerConfig
    from qwen3tts_tpu.models import talker as T

    def mk(layer_types):
        return TalkerConfig(
            hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16, intermediate_size=128,
            mrope_section=(4, 2, 2), vocab_size=256, text_vocab_size=64,
            text_hidden_size=64, speaker_embed_dim=64,
            sliding_window=8, layer_types=layer_types,
        )

    cfg = mk(("full_attention", "sliding_attention") * 2)
    params = T.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    H = cfg.hidden_size
    embeds = jax.random.normal(jax.random.PRNGKey(1), (2, 12, H), jnp.float32) * 0.1
    pad = jnp.asarray([0, 3], jnp.int32)

    def run(cfg, use_flash):
        kv = T.new_kv_cache(cfg, batch=2, max_len=32, dtype=jnp.float32)
        _, _, kv = T.prefill(params, cfg, embeds, pad, kv)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 1, H), jnp.float32) * 0.1
        outs = []
        for pos in (12, 13):  # past the window for row 0 (eff pos > 8)
            x2, kv = T.decode_step(params, cfg, x, jnp.int32(pos), pad, kv,
                                   use_flash=use_flash)
            outs.append(np.asarray(x2))
        return np.stack(outs)

    out_flash = run(cfg, True)
    out_masked = run(cfg, False)
    np.testing.assert_allclose(out_flash, out_masked, rtol=1e-5, atol=1e-5)

    # guard against a vacuous pass: an all-full stack must give a DIFFERENT
    # answer at these positions (the window is genuinely active)
    out_allfull = run(mk(("full_attention",) * 4), True)
    assert not np.allclose(out_flash, out_allfull, atol=1e-5)
