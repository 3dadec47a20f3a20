"""Talker prompt assembly — the TPU equivalent of the reference's
``_build_talker_inputs_local`` (model.py:331-553) and upstream
``generate_icl_prompt`` (SURVEY.md §2.2).

Layout (batch 1, positions left→right):

  [role(3)] [think block + optional speaker + codec_pad] then either
    streaming:      [text₀+codec_bos]                  (trailing = text₁.. + tts_eos)
    non-streaming:  [all text + tts_eos over codec_pad] [tts_pad+codec_bos]
                                                       (trailing = tts_pad)
    ICL:            [text₀+codec_bos] [textⱼ+ref_frameⱼ₋₁ ...]
                                                       (trailing = unconsumed text)

Every codec-frame embedding — both ref frames here and generated frames in
the decode loop (engine.py) — is the sum of the talker codebook-0 embedding
and the 15 predictor codebook embeddings (reference generate.py:163-166), so
prompt and decode stay in one representation space.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.config import TTSModelConfig
from ..models import talker as talker_lib

Array = jnp.ndarray


class PromptError(ValueError):
    pass


def _frame_embeds(tparams, pparams, codes: np.ndarray) -> Array:
    """codes [T,16] → per-frame summed embeddings [1,T,H]."""
    codes = jnp.asarray(codes, jnp.int32)
    emb = talker_lib.embed_codec(tparams, codes[:, 0])  # [T, H]
    # predictor codebook embeddings live in talker space (predictor.py)
    tables = pparams["codec_embeddings"]  # [15, CB, H]
    for i in range(tables.shape[0]):
        emb = emb + tables[i][codes[:, i + 1]]
    return emb[None]


def build_talker_inputs(
    tparams: Dict,
    pparams: Dict,
    cfg: TTSModelConfig,
    *,
    input_ids: np.ndarray,  # [1, L] assistant-templated target text
    ref_ids: Optional[np.ndarray] = None,  # [1, Lr] ref-templated transcript (ICL)
    spk_embedding: Optional[Array] = None,  # [H] x-vector-derived speaker embed
    ref_codes: Optional[np.ndarray] = None,  # [Tr, 16] codec codes of ref audio
    icl_mode: bool = False,
    language: str = "English",
    speaker: Optional[str] = None,
    non_streaming_mode: bool = False,
    instruct_ids: Optional[np.ndarray] = None,
) -> Tuple[Array, Array, Array]:
    """Returns (talker_input_embeds [1,T,H], trailing_text_hiddens [1,Tt,H],
    tts_pad_embed [1,1,H]).  Raises PromptError for unknown speaker/language
    (reference model.py:367-368, 383-384)."""
    tk = cfg.talker

    def etext(ids) -> Array:
        return talker_lib.embed_text(tparams, jnp.asarray(ids, jnp.int32))

    def ecodec(ids) -> Array:
        return talker_lib.embed_codec(tparams, jnp.asarray(ids, jnp.int32))

    parts = []
    if instruct_ids is not None:
        parts.append(etext(instruct_ids))

    # --- speaker embedding (reference model.py:362-377)
    if spk_embedding is not None:
        speaker_embed = jnp.reshape(spk_embedding, (1, 1, -1))
    elif speaker:
        if speaker.lower() not in tk.spk_id:
            raise PromptError(f"Speaker {speaker} not implemented")
        speaker_embed = ecodec([[tk.spk_id[speaker.lower()]]])
    else:
        speaker_embed = None

    # --- language id + dialect override (reference model.py:379-393)
    if language is None or language.lower() == "auto":
        language_id = None
    else:
        if language.lower() not in tk.codec_language_id:
            raise PromptError(f"Language {language} not implemented")
        language_id = tk.codec_language_id[language.lower()]
    if (
        (language is None or language.lower() in ("chinese", "auto"))
        and speaker
        and tk.spk_is_dialect.get(speaker.lower())
    ):
        language_id = tk.codec_language_id[tk.spk_is_dialect[speaker.lower()]]

    # --- tts control-token text embeddings (reference model.py:395-403)
    ctl = etext([[cfg.tts_bos_token_id, cfg.tts_eos_token_id, cfg.tts_pad_token_id]])
    tts_bos, tts_eos, tts_pad = ctl[:, 0:1], ctl[:, 1:2], ctl[:, 2:3]

    # --- think/language block (reference model.py:405-417)
    if language_id is None:
        prefill_ids = [tk.codec_nothink_id, tk.codec_think_bos_id, tk.codec_think_eos_id]
    else:
        prefill_ids = [tk.codec_think_id, tk.codec_think_bos_id, language_id, tk.codec_think_eos_id]
    codec_emb_0 = ecodec([prefill_ids])
    codec_emb_1 = ecodec([[tk.codec_pad_id, tk.codec_bos_id]])
    if speaker_embed is None:
        codec_input = jnp.concatenate([codec_emb_0, codec_emb_1], axis=1)
    else:
        codec_input = jnp.concatenate(
            [codec_emb_0, speaker_embed.astype(codec_emb_0.dtype), codec_emb_1], axis=1
        )

    # --- role prefix + head (reference model.py:434-445)
    role = etext(input_ids[:, :3])
    n_head = codec_input.shape[1] - 2
    head = (
        jnp.concatenate([jnp.broadcast_to(tts_pad, (1, n_head, tts_pad.shape[-1])), tts_bos], axis=1)
        + codec_input[:, :-1]
    )
    talker_input = jnp.concatenate([role, head], axis=1)
    bos_emb = codec_input[:, -1:]

    text_ids = input_ids[:, 3:-5]

    if icl_mode and ref_codes is not None and ref_ids is not None:
        # --- ICL: position-aligned text+codec sum over the reference frames
        full_text = jnp.concatenate(
            [etext(ref_ids[:, 3:-2]), etext(text_ids)], axis=1
        )  # [1, L, H]
        L = full_text.shape[1]
        frames = _frame_embeds(tparams, pparams, ref_codes)  # [1, Tr, H]
        Tr = frames.shape[1]
        text_seq = jnp.concatenate([full_text, tts_eos], axis=1)  # [1, L+1, H]

        if non_streaming_mode:
            # pack all text over codec_pad, then bos, then ref frames w/ tts_pad
            pad_codes = ecodec([[tk.codec_pad_id] * (L + 1)])
            part1 = text_seq + pad_codes
            part2 = tts_pad + bos_emb
            part3 = jnp.broadcast_to(tts_pad, (1, Tr, tts_pad.shape[-1])) + frames
            talker_input = jnp.concatenate([talker_input, part1, part2, part3], axis=1)
            trailing = tts_pad
        else:
            # interleave: pos0 = text₀+bos; pos j = text_j (or pad) + frame_{j-1}
            need = 1 + Tr
            if text_seq.shape[1] < need:
                pad_n = need - text_seq.shape[1]
                text_seq_p = jnp.concatenate(
                    [text_seq, jnp.broadcast_to(tts_pad, (1, pad_n, tts_pad.shape[-1]))], axis=1
                )
            else:
                text_seq_p = text_seq
            pos0 = text_seq_p[:, 0:1] + bos_emb
            body = text_seq_p[:, 1 : 1 + Tr] + frames
            talker_input = jnp.concatenate([talker_input, pos0, body], axis=1)
            # trailing = text not yet consumed (tokens 1+Tr ... L, then tts_eos)
            if 1 + Tr < L + 1:
                trailing = text_seq[:, 1 + Tr :]
            else:
                trailing = tts_pad  # exhausted — engine falls back to pad anyway
    else:
        first_tok = etext(input_ids[:, 3:4]) + bos_emb
        talker_input = jnp.concatenate([talker_input, first_tok], axis=1)
        if non_streaming_mode:
            # (reference model.py:472-504): full text + tts_eos over codec_pad
            # frames packed into the prefill, then tts_pad + codec_bos
            talker_input = talker_input[:, :-1]
            n_text = text_ids.shape[1]
            pad_codes = ecodec([[tk.codec_pad_id] * (n_text + 1)])
            packed = jnp.concatenate([etext(text_ids), tts_eos], axis=1) + pad_codes
            last = tts_pad + ecodec([[tk.codec_bos_id]])
            talker_input = jnp.concatenate([talker_input, packed, last], axis=1)
            trailing = tts_pad
        else:
            trailing = jnp.concatenate([etext(input_ids[:, 4:-5]), tts_eos], axis=1)

    parts.append(talker_input)
    talker_input = jnp.concatenate(parts, axis=1)
    return talker_input, trailing, tts_pad
