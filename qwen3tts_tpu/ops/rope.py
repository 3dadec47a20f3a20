"""Multi-axis rotary position embeddings (MRoPE) for the talker.

The reference keeps a ``[3, 1, 1]`` position buffer and expands a single
scalar position to all three axes at decode time (talker_graph.py:52-53,
209-211).  Here positions are traced scalars/vectors, so no buffers or mask
tables are needed: cos/sin are computed in-graph from the positions.

For TTS, all three MRoPE axes carry the same position value, which makes
MRoPE numerically identical to standard RoPE; the section logic is kept so a
checkpoint with true multi-axis positions loads unchanged.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def mrope_cos_sin(
    positions: jnp.ndarray,  # [3, B, T] (or [B, T] for single-axis RoPE)
    head_dim: int,
    theta: float,
    sections: Sequence[int] | None,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (cos, sin) each of shape [B, T, head_dim]."""
    half = head_dim // 2
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, half, dtype=jnp.float32) / float(half))
    )  # [half]

    if positions.ndim == 2:
        positions = jnp.broadcast_to(positions[None], (3,) + positions.shape)

    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [3, B, T, half]

    if sections is None:
        freqs = freqs[0]
    else:
        assert sum(sections) == half, (sections, half)
        axis_of_dim = jnp.concatenate(
            [jnp.full((s,), i, dtype=jnp.int32) for i, s in enumerate(sections)]
        )  # [half]
        # gather the per-dimension axis: freqs[axis_of_dim[d], :, :, d]
        freqs = jnp.take_along_axis(
            freqs, axis_of_dim[None, None, :, None].transpose(3, 0, 1, 2), axis=0
        )[0]  # [B, T, half]

    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [B, T, head_dim]
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    q: jnp.ndarray,  # [B, T, NH, D]
    k: jnp.ndarray,  # [B, T, KVH, D]
    cos: jnp.ndarray,  # [B, T, D]
    sin: jnp.ndarray,  # [B, T, D]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    q = q * cos + rotate_half(q) * sin
    k = k * cos + rotate_half(k) * sin
    return q, k
