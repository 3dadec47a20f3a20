"""Int8 weight-only quantization for the decode path.

Batch-1 decode is weight-bandwidth-bound (the 0.6B talker reads ~870 MB of
bf16 weights per step); storing matmul weights as int8 with per-output-channel
scales halves the bytes.  XLA fuses the int8→bf16 convert + scale into the
dot's operand read, so there is no materialized dequantized copy.

Opt-in: ``FasterQwen3TTS.from_pretrained(..., quantize="int8")``.  Only the
layer-stack projection matrices are quantized (embeddings/norms/heads stay in
the model dtype — they are small or accuracy-critical).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

# layer-stack leaves worth quantizing: [L, in, out] projection matrices
_QUANT_KEYS = ("qkv_proj", "o_proj", "gateup_proj", "down_proj")


def quantize_tensor(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[..., in, out] float → {'q': int8, 'scale': f32 per-out-channel}."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # per out channel
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale}


def dequant_matmul(x: jnp.ndarray, qw: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """x @ dequant(qw) with the convert fused into the dot by XLA."""
    y = jnp.matmul(x, qw["q"].astype(x.dtype), preferred_element_type=jnp.float32)
    return (y * qw["scale"].astype(jnp.float32)).astype(x.dtype)


def is_quantized(leaf: Any) -> bool:
    return isinstance(leaf, dict) and set(leaf) == {"q", "scale"}


def quantize_block_stack(blocks: Dict[str, jnp.ndarray]) -> Dict[str, Any]:
    """Quantize the projection matrices of a layer-stacked block dict."""
    out: Dict[str, Any] = {}
    for k, v in blocks.items():
        out[k] = quantize_tensor(v) if k in _QUANT_KEYS else v
    return out


def quantize_bundle(bundle: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize the talker + predictor decode-path weights in a param bundle.

    Beyond the block projections, the predictor's per-codebook lm_heads are
    quantized too: they are read in FULL every frame (15 × [Hp, CB] ≈ 60 MB
    bf16 per frame — benchmarks/decompose.py), unlike embeddings which are
    row-gathered."""
    out = dict(bundle)
    for part in ("talker", "predictor"):
        p = dict(bundle[part])
        p["blocks"] = quantize_block_stack(p["blocks"])
        if part == "predictor":
            p["lm_heads"] = quantize_tensor(p["lm_heads"])
        out[part] = p
    return out


def maybe_matmul(x: jnp.ndarray, w: Any) -> jnp.ndarray:
    """x @ w for either a plain array or a quantized {'q','scale'} dict."""
    if is_quantized(w):
        return dequant_matmul(x, w)
    return x @ w
