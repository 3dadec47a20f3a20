"""Unit tests for sampling ops (reference tests/test_sampling.py pattern:
pure-CPU math tests, no real weights)."""
import jax
import jax.numpy as jnp
import numpy as np

from qwen3tts_tpu.ops.sampling import (
    apply_repetition_penalty,
    build_suppress_mask,
    sample_logits,
)


def test_repetition_penalty_matches_reference_math():
    """HF semantics: positive seen logits divided, negative multiplied
    (reference sampling.py:10-29)."""
    logits = jnp.array([[2.0, -1.0, 0.5, -3.0]])
    seen = jnp.array([True, True, False, False])
    out = apply_repetition_penalty(logits, seen, 2.0)
    np.testing.assert_allclose(np.asarray(out), [[1.0, -2.0, 0.5, -3.0]])


def test_repetition_penalty_noop_at_one():
    logits = jnp.array([[2.0, -1.0]])
    out = apply_repetition_penalty(logits, jnp.array([True, True]), 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(logits))


def test_suppress_mask_shape_and_eos():
    """Top-1024 ids suppressed except EOS (reference generate.py:46-50)."""
    mask = build_suppress_mask(3072, eos_id=2150)
    assert mask.shape == (3072,)
    assert not mask[:2048].any()
    assert mask[2048:].sum() == 1024 - 1
    assert not mask[2150]


def test_greedy_ignores_key_and_respects_suppression():
    logits = jnp.zeros((1, 3072)).at[0, 3000].set(10.0).at[0, 100].set(5.0)
    mask = jnp.asarray(build_suppress_mask(3072, eos_id=2150))
    tok1 = sample_logits(jax.random.PRNGKey(0), logits, temperature=1.0, top_k=0,
                         top_p=1.0, do_sample=False, suppress_mask=mask)
    tok2 = sample_logits(jax.random.PRNGKey(42), logits, temperature=1.0, top_k=0,
                         top_p=1.0, do_sample=False, suppress_mask=mask)
    assert int(tok1[0]) == int(tok2[0]) == 100  # 3000 is suppressed


def test_top_k_restricts_support():
    key = jax.random.PRNGKey(0)
    logits = jnp.arange(100.0)[None, :]  # top-5 = ids 95..99
    toks = [int(sample_logits(jax.random.fold_in(key, i), logits, temperature=1.0,
                              top_k=5, top_p=1.0, do_sample=True)[0])
            for i in range(50)]
    assert all(t >= 95 for t in toks)
    assert len(set(toks)) > 1  # actually sampling


def test_top_p_keeps_top1_even_when_tiny():
    logits = jnp.log(jnp.array([[0.9, 0.06, 0.04]]))
    toks = [int(sample_logits(jax.random.PRNGKey(i), logits, temperature=1.0,
                              top_k=0, top_p=0.5, do_sample=True)[0])
            for i in range(20)]
    assert set(toks) == {0}  # cumsum crosses 0.5 at id 0; only top-1 kept


def test_suppress_eos_traced_flag():
    logits = jnp.zeros((1, 10)).at[0, 7].set(10.0)
    tok = sample_logits(jax.random.PRNGKey(0), logits, temperature=1.0, top_k=0,
                        top_p=1.0, do_sample=False,
                        suppress_eos=jnp.asarray(True), eos_id=7)
    assert int(tok[0]) != 7
    tok = sample_logits(jax.random.PRNGKey(0), logits, temperature=1.0, top_k=0,
                        top_p=1.0, do_sample=False,
                        suppress_eos=jnp.asarray(False), eos_id=7)
    assert int(tok[0]) == 7
