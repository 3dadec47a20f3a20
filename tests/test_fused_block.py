"""Fused weight-streaming kernels (ops/fused_block.py) vs the XLA path.

CPU runs the kernels in interpreter mode (ops/fused_block.py:_use_interpret);
the numerics contract is "same math as models/layers.py:block_forward up to
bf16 rounding" — the talker/predictor decode steps switch between the two
paths based on Engine.use_fused_kernels, so any drift here is a correctness
bug, not a tolerance knob.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.models.layers import (
    BlockSpec,
    block_forward,
    decode_mask,
    init_block_stack,
    init_kv_cache,
    rms_norm,
)
from qwen3tts_tpu.ops.fused_block import fused_norm_matmul, fused_o_mlp
from qwen3tts_tpu.ops.rope import mrope_cos_sin

EPS = 1e-6


def _rand(key, shape, dtype=jnp.bfloat16):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


@pytest.mark.parametrize("B", [1, 4])
def test_fused_norm_matmul_matches_oracle(B):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    H, N = 256, 1024
    x = _rand(ks[0], (B, H))
    nw = _rand(ks[1], (H,))
    w = _rand(ks[2], (H, N)) * 0.05
    got = fused_norm_matmul(x, nw, w, eps=EPS, tile=256)
    want = rms_norm(x, nw, EPS) @ w
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.05, rtol=0.05)


@pytest.mark.parametrize("B", [1, 4])
def test_fused_o_mlp_matches_oracle(B):
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    H, Dq, I = 256, 512, 768
    x = _rand(ks[0], (B, H))
    attn = _rand(ks[1], (B, Dq))
    ow = _rand(ks[2], (Dq, H)) * 0.05
    nw = _rand(ks[3], (H,))
    guw = _rand(ks[4], (H, 2 * I)) * 0.05
    dw = _rand(ks[5], (I, H)) * 0.05

    got = fused_o_mlp(x, attn, ow, nw, guw, dw, eps=EPS, tile=256)

    x2 = x + attn @ ow
    h = rms_norm(x2, nw, EPS)
    gu = h @ guw
    want = x2 + (jax.nn.silu(gu[..., :I]) * gu[..., I:]) @ dw
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.05, rtol=0.05)


@pytest.mark.parametrize("B", [1, 2])
def test_fused_norm_matmul_int8(B):
    """Int8 weight-only mode: DMA'd int8 tiles + in-kernel dequant must match
    the XLA dequant_matmul formulation."""
    from qwen3tts_tpu.ops.quant import dequant_matmul, quantize_tensor

    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    H, N = 256, 1024
    x = _rand(ks[0], (B, H))
    nw = _rand(ks[1], (H,))
    w = _rand(ks[2], (H, N)) * 0.05
    qw = quantize_tensor(w)
    got = fused_norm_matmul(x, nw, qw, eps=EPS, tile=256)
    want = dequant_matmul(rms_norm(x, nw, EPS), qw)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.05, rtol=0.05)


def test_fused_o_mlp_int8():
    from qwen3tts_tpu.ops.quant import dequant_matmul, quantize_tensor

    ks = jax.random.split(jax.random.PRNGKey(4), 6)
    B, H, Dq, I = 1, 256, 512, 768
    x = _rand(ks[0], (B, H))
    attn = _rand(ks[1], (B, Dq))
    ow = _rand(ks[2], (Dq, H)) * 0.05
    nw = _rand(ks[3], (H,))
    guw = _rand(ks[4], (H, 2 * I)) * 0.05
    dw = _rand(ks[5], (I, H)) * 0.05
    q = quantize_tensor

    got = fused_o_mlp(x, attn, q(ow), nw, q(guw), q(dw), eps=EPS, tile=256)

    x2 = x + dequant_matmul(attn, q(ow))
    h = rms_norm(x2, nw, EPS)
    gu = dequant_matmul(h, q(guw))
    want = x2 + dequant_matmul(jax.nn.silu(gu[..., :I]) * gu[..., I:], q(dw))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.05, rtol=0.05)


@pytest.mark.slow
@pytest.mark.parametrize("quantized", [False, True])
def test_block_forward_fused_matches_plain(quantized):
    """Whole decoder block: fused Pallas path == XLA path (decode shape),
    for both plain bf16 and weight-only int8 stacks."""
    spec = BlockSpec(
        num_layers=1, hidden_size=128, num_heads=4, num_kv_heads=2,
        head_dim=32, intermediate_size=384, rms_norm_eps=EPS)
    key = jax.random.PRNGKey(2)
    stack = init_block_stack(key, spec, jnp.bfloat16)
    if quantized:
        from qwen3tts_tpu.ops.quant import quantize_block_stack

        stack = quantize_block_stack(stack)
    lp = jax.tree.map(lambda a: a[0], stack)

    B, S, pos_i = 2, 64, 10
    x = _rand(jax.random.PRNGKey(3), (B, 1, spec.hidden_size))
    kv = init_kv_cache(spec, B, S, jnp.bfloat16)
    pos = jnp.int32(pos_i)
    pad = jnp.zeros((B,), jnp.int32)
    cos, sin = mrope_cos_sin(
        jnp.broadcast_to(jnp.full((B, 1), pos_i, jnp.int32)[None], (3, B, 1)),
        spec.head_dim, 1e6, None, dtype=jnp.float32)
    mask = decode_mask(S, pos, pad)

    x_p, kv_p = block_forward(lp, x, cos, sin, kv, jnp.int32(0),
                              pos, mask, spec, fused=False)
    x_f, kv_f = block_forward(lp, x, cos, sin, kv, jnp.int32(0),
                              pos, mask, spec, fused=True)
    for a, b, name in ((x_p, x_f, "x"), (kv_p["k"], kv_f["k"], "k"),
                       (kv_p["v"], kv_f["v"], "v")):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=0.05, rtol=0.05, err_msg=name)
