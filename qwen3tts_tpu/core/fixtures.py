"""Golden-fixture parity layer (reference test layer 1, test_e2e_parity.py:411-580).

The reference proves fp32 token-for-token equality against the upstream
model.  In this zero-egress environment the upstream half cannot run, so the
machinery is built and self-hosted NOW (fixtures exported from this
framework's own parity path) and becomes an upstream-grounded check the day
real weights land:

  1. On a machine with the upstream model, run the reference's parity mode
     (or this framework against real weights) and call ``export_fixture`` —
     one command per (mode, text, seed) case.
  2. Commit the ``.npz`` files under ``tests/fixtures/``.
  3. ``check_fixture`` replays the stored prompt through THIS framework in
     fp32 matmul precision (the TF32-off analog, reference tests:253-256)
     and asserts (a) the prefill-embedding checksum — isolating
     prompt-assembly drift from decode drift — and (b) exact token equality.

Fixture format (single .npz):
  tokens            int32 [steps, 16]  — the full codec-id parity sequence
  prefill_embeds    float32 [T, H]     — OPTIONAL full prefill embeddings
  meta              json str: {text, language, mode, seed, policy knobs,
                     prefill_sha256, framework_version}
"""
from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import numpy as np

FIXTURE_VERSION = 1


def _embeds_sha256(embeds: np.ndarray) -> str:
    """Checksum of the prompt embeddings in a canonical representation.

    fp32 prompt assembly is deterministic host numpy, so byte-exact hashing
    is stable across machines."""
    arr = np.ascontiguousarray(np.asarray(embeds, np.float32))
    return hashlib.sha256(arr.tobytes()).hexdigest()


def export_fixture(
    path: str | Path,
    *,
    tokens: np.ndarray,  # [steps, 16]
    prefill_embeds: np.ndarray,  # [B, T, H] or [T, H]
    meta: Dict,
    store_embeds: bool = False,
) -> None:
    """Write a golden parity fixture.  ``meta`` must carry the prompt recipe
    (text/language/mode/seed/sampling knobs) so ``check_fixture`` can replay
    it without ambiguity."""
    pe = np.asarray(prefill_embeds, np.float32)
    if pe.ndim == 3:
        pe = pe[0]
    meta = dict(meta)
    meta["prefill_sha256"] = _embeds_sha256(pe)
    meta["fixture_version"] = FIXTURE_VERSION
    arrays = {"tokens": np.asarray(tokens, np.int32),
              "meta": np.frombuffer(json.dumps(meta).encode(), np.uint8)}
    if store_embeds:
        arrays["prefill_embeds"] = pe
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **arrays)


def load_fixture(path: str | Path) -> Tuple[np.ndarray, Dict, Optional[np.ndarray]]:
    """Returns (tokens, meta, prefill_embeds|None)."""
    with np.load(Path(path)) as z:
        tokens = z["tokens"]
        meta = json.loads(bytes(z["meta"].tobytes()).decode())
        pe = z["prefill_embeds"] if "prefill_embeds" in z.files else None
    if meta.get("fixture_version", 0) > FIXTURE_VERSION:
        raise ValueError(f"fixture {path} is from a newer format version")
    return tokens, meta, pe


def export_model_fixture(
    model,
    path: str | Path,
    *,
    text: str,
    language: str = "english",
    speaker: Optional[str] = None,
    seed: int = 1337,
    max_new_tokens: int = 64,
    store_embeds: bool = False,
) -> Dict:
    """One-command fixture export: run THIS model's parity path (un-bucketed
    per-step decode) in fp32 matmul precision, greedy codebook-0, and store
    the token sequence + prompt checksum.  Returns the meta dict."""
    from ..models.predictor import SamplingPolicy
    from ..runtime import loops
    from ..runtime.engine import GenerationPolicy

    if speaker is not None:
        host_embeds = None  # custom path has no host-side checksum contract
        embeds, trailing, tpe = model._prepare_custom(text, language, speaker, None)
        mode = "custom"
    else:
        # checksum the HOST f32 prompt (check_model_fixture hashes the same
        # representation — before the model-dtype cast)
        host_embeds, t, p = model.prompt_builder.build(
            input_ids=model.tokenizer.build_assistant_ids(text),
            language=language, non_streaming_mode=True,
        )
        embeds, trailing, tpe = model._to_device(host_embeds, t, p)
        mode = "plain"
    pol = GenerationPolicy(do_sample=False)
    ppol = SamplingPolicy(do_sample=False)
    with jax.default_matmul_precision("float32"):
        tokens, _ = loops.parity_generate(
            model.engine, embeds, trailing, tpe,
            key=jax.random.PRNGKey(seed), max_new_tokens=max_new_tokens,
            policy=pol, pred_policy=ppol,
        )
    meta = {"text": text, "language": language, "speaker": speaker,
            "mode": mode, "seed": seed, "max_new_tokens": max_new_tokens,
            "greedy": True}
    export_fixture(
        path, tokens=np.asarray(tokens),
        prefill_embeds=np.asarray(host_embeds if host_embeds is not None else embeds),
        meta=meta, store_embeds=store_embeds)
    return meta


def check_model_fixture(model, path: str | Path) -> None:
    """Replay a fixture through ``model`` and assert exact parity.

    Raises AssertionError with a targeted message: a prefill-checksum
    mismatch means the PROMPT ASSEMBLY drifted (reference hard-part #2); a
    token mismatch with matching checksum means the DECODE NUMERICS drifted."""
    from ..models.predictor import SamplingPolicy
    from ..runtime import loops
    from ..runtime.engine import GenerationPolicy

    golden_tokens, meta, _ = load_fixture(path)
    if meta.get("speaker") is not None:
        embeds, trailing, tpe = model._prepare_custom(
            meta["text"], meta["language"], meta["speaker"], None)
    else:
        e, t, p = model.prompt_builder.build(
            input_ids=model.tokenizer.build_assistant_ids(meta["text"]),
            language=meta["language"], non_streaming_mode=True,
        )
        got_sha = _embeds_sha256(np.asarray(e)[0])
        assert got_sha == meta["prefill_sha256"], (
            f"PROMPT ASSEMBLY drift: prefill embedding checksum {got_sha[:12]} "
            f"!= fixture {meta['prefill_sha256'][:12]} (layout/tokenizer/"
            f"embedding-table change)")
        embeds, trailing, tpe = model._to_device(e, t, p)
    pol = GenerationPolicy(do_sample=False)
    ppol = SamplingPolicy(do_sample=False)
    with jax.default_matmul_precision("float32"):
        tokens, _ = loops.parity_generate(
            model.engine, embeds, trailing, tpe,
            key=jax.random.PRNGKey(meta["seed"]),
            max_new_tokens=meta["max_new_tokens"], policy=pol, pred_policy=ppol,
        )
    tokens = np.asarray(tokens)
    assert tokens.shape == golden_tokens.shape, (
        f"DECODE drift: {tokens.shape[0]} steps vs golden {golden_tokens.shape[0]}")
    bad = np.argwhere(tokens != golden_tokens)
    assert bad.size == 0, (
        f"DECODE drift: first token mismatch at step {bad[0][0]} "
        f"codebook {bad[0][1]}")
