"""Pure-jnp sampling ops: suppress → temperature → top-k → top-p → categorical.

Mirrors the reference semantics (faster_qwen3_tts/sampling.py:32-66, HF
processor order) but is fully traceable: the PRNG key is threaded through the
jitted step functions, so — unlike the reference, whose sampling policy is
frozen into the captured CUDA graph (predictor_graph.py:34-50) — the policy
here is just function arguments.

Repetition penalty: the reference penalizes each *unique* previously-seen id
once via ``tensor.unique()`` (sampling.py:10-29).  ``unique`` is not
jit-friendly, so the decode loops carry a boolean ``seen`` mask over the vocab
updated with ``seen.at[token].set(True)`` — mathematically identical.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def build_suppress_mask(vocab_size: int, eos_id: int, zone: int = 1024) -> np.ndarray:
    """Boolean [V]: True = suppress.  The top `zone` ids are control tokens and
    must never be sampled, except EOS (reference generate.py:46-50)."""
    mask = np.zeros(vocab_size, dtype=bool)
    start = max(0, vocab_size - zone)
    mask[start:] = True
    mask[eos_id] = False
    return mask


def apply_repetition_penalty(
    logits: jnp.ndarray,  # [..., V]
    seen: jnp.ndarray,  # [V] bool — ids generated so far
    penalty,  # python float or traced scalar
) -> jnp.ndarray:
    if isinstance(penalty, (int, float)) and penalty == 1.0:
        return logits
    lf = logits.astype(jnp.float32)
    penalized = jnp.where(lf > 0, lf / penalty, lf * penalty)
    return jnp.where(seen, penalized, lf)


def sample_logits(
    key: jax.Array,
    logits: jnp.ndarray,  # [B, V]
    *,
    temperature,  # python float or traced scalar
    top_k: int,  # STATIC (selects the top_k op width)
    top_p,  # python float or traced scalar; use_top_p gates the code path
    do_sample: bool,  # STATIC (control flow)
    use_top_p: Optional[bool] = None,  # STATIC; default inferred from top_p
    suppress_mask: Optional[jnp.ndarray] = None,  # [V] bool
    suppress_eos: Optional[jnp.ndarray] = None,  # scalar or [B] bool (traced ok)
    eos_id: int = -1,
) -> jnp.ndarray:
    """Returns sampled token ids [B].  ``do_sample``/``top_k``/``use_top_p``
    are static structure; ``temperature``/``top_p`` may be traced scalars so
    per-request knob changes do NOT recompile (unlike the reference, which
    freezes the policy into the captured graph, predictor_graph.py:34-50)."""
    logits = logits.astype(jnp.float32)
    V = logits.shape[-1]
    if suppress_mask is not None:
        logits = jnp.where(suppress_mask[None, :], NEG_INF, logits)
    if suppress_eos is not None and eos_id >= 0:
        eos_col = jnp.arange(V) == eos_id
        se = jnp.asarray(suppress_eos)
        if se.ndim == 1:  # per-row (continuous batching: rows differ in n_gen)
            se = se[:, None]
        logits = jnp.where(se & eos_col[None, :], NEG_INF, logits)

    if not do_sample:
        return jnp.argmax(logits, axis=-1)

    logits = logits / temperature
    # Fusing the constant suppress mask into TopK/Sort comparators triggers a
    # pathological XLA compile blowup (~20x measured); the barrier keeps the
    # masked logits materialized before the selection ops.
    logits = jax.lax.optimization_barrier(logits)

    if top_k > 0 and top_k < V:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)

    if use_top_p is None:
        use_top_p = not (isinstance(top_p, (int, float)) and top_p >= 1.0)
    if use_top_p:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # HF semantics (reference sampling.py:57-65): drop ids whose inclusive
        # cumulative prob exceeds top_p, but always keep the top-1.
        keep_sorted = cum <= top_p
        keep_sorted = keep_sorted.at[..., 0].set(True)
        # threshold = smallest kept logit
        thresh = jnp.min(
            jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < thresh, NEG_INF, logits)

    return jax.random.categorical(key, logits, axis=-1)
