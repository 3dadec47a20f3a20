"""Fused predictor micro-step kernel (ops/predictor_step.py) vs the XLA
layer-stack path.

Contract: for the same inputs/KV state, fused_micro_step's hidden output and
updated KV rows match models/layers.py:stack_forward + rms_norm to float
tolerance — including with MULTI-TILE schedules (tile/hpt shrunk so nH,
TQ_t, gu_t, dn_t are all > 1, exercising _build_schedule's prefetch tables,
the per-tile residual adds and the cross-tile down accumulator).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.models import predictor as P
from qwen3tts_tpu.models.layers import (
    decode_mask, init_kv_cache, rms_norm, stack_forward,
)
from qwen3tts_tpu.ops.predictor_step import (
    fused_micro_step, relayout_micro_kernel_weights,
)


@pytest.fixture(scope="module")
def setup(tiny_cfg):
    cfg = tiny_cfg.predictor
    Ht = tiny_cfg.talker.hidden_size
    params = P.init_params(jax.random.PRNGKey(0), cfg, Ht, jnp.float32)
    return cfg, Ht, params


def _oracle_step(params, cfg, x_emb, kv, pos_i):
    """One micro-step via the production stack path (predictor coords)."""
    spec = P.block_spec(cfg)
    S = cfg.max_seq
    h = P._proj(params, x_emb)[:, None, :]
    pos = jnp.int32(pos_i)
    cos, sin = P._rope(cfg, jnp.full((1, 1), pos_i, jnp.int32))
    m = decode_mask(S, pos, jnp.zeros((1,), jnp.int32), cfg.sliding_window)
    y, kv = stack_forward(params["blocks"], h, cos, sin, kv, pos, m, spec)
    y = rms_norm(y, params["final_norm"], cfg.rms_norm_eps)
    return y[:, 0, :], kv


def _run_fused(params, cfg, x_emb, kk, vv, pos_i, tile=512, hpt=8):
    hm = relayout_micro_kernel_weights(
        params["blocks"], params["small_to_mtp"]["b"], params["final_norm"],
        cfg.head_dim, cfg.num_key_value_heads, tile=tile, hpt=hpt)
    cos, sin = P._rope(cfg, jnp.full((1, 1), pos_i, jnp.int32))
    return fused_micro_step(
        hm, params["small_to_mtp"]["w"], x_emb, cos[0, 0], sin[0, 0],
        kk, vv, jnp.int32(pos_i), eps=cfg.rms_norm_eps, tile=tile, hpt=hpt)


@pytest.mark.parametrize("tile,hpt", [(512, 8), (16, 2)])
def test_fused_micro_step_matches_stack(setup, tile, hpt):
    """(512, 8) = production tiling (single-tile on the tiny shapes);
    (16, 2) forces nH/TQ_t/gu_t/dn_t > 1 — the multi-tile schedule."""
    cfg, Ht, params = setup
    S = cfg.max_seq
    spec = P.block_spec(cfg)
    kv = init_kv_cache(spec, 1, S, jnp.float32)

    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, Ht), jnp.float32) * 0.1
    x1 = jax.random.normal(jax.random.PRNGKey(2), (1, Ht), jnp.float32) * 0.1
    _, kv = _oracle_step(params, cfg, x0, kv, 0)
    _, kv = _oracle_step(params, cfg, x1, kv, 1)

    x2 = jax.random.normal(jax.random.PRNGKey(3), (1, Ht), jnp.float32) * 0.1
    want_h, want_kv = _oracle_step(params, cfg, x2, kv, 2)

    got_h, kk, vv = _run_fused(params, cfg, x2, kv["k"][:, 0], kv["v"][:, 0],
                               2, tile=tile, hpt=hpt)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(kk), np.asarray(want_kv["k"][:, 0]),
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(vv), np.asarray(want_kv["v"][:, 0]),
                               atol=2e-4, rtol=2e-3)


def test_fused_micro_step_sequence(setup):
    """Three consecutive fused micro-steps == three oracle steps (multi-tile
    tiling to exercise accumulator reset between steps)."""
    cfg, Ht, params = setup
    S = cfg.max_seq
    spec = P.block_spec(cfg)
    kv_o = init_kv_cache(spec, 1, S, jnp.float32)
    kk, vv = kv_o["k"][:, 0], kv_o["v"][:, 0]

    for pos_i in range(3):
        xe = jax.random.normal(jax.random.PRNGKey(10 + pos_i), (1, Ht),
                               jnp.float32) * 0.1
        want_h, kv_o = _oracle_step(params, cfg, xe, kv_o, pos_i)
        got_h, kk, vv = _run_fused(params, cfg, xe, kk, vv, pos_i,
                                   tile=16, hpt=2)
        np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                                   atol=3e-4, rtol=3e-3,
                                   err_msg=f"pos {pos_i}")
