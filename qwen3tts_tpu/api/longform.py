"""Long-form synthesis: sentence chunking over the bounded context window.

The reference's sequence-length strategy is a hard 2048-slot static cache
with refusal above it, and "document sentence-chunking at the app layer as
the long-text answer" (SURVEY.md §5 long-context row; talker_graph.py:163-167
raises for over-long inputs).  This module IS that app layer: split text into
sentence groups that fit the window, synthesize each with the same voice
prompt (the voice-prompt cache makes repeat prompt encoding free,
model.py:230-232), and join with a short silence.
"""
from __future__ import annotations

import re
from typing import Generator, List, Optional, Tuple

import numpy as np

_SENT_RE = re.compile(r"([^.!?。！？]*[.!?。！？]+|[^.!?。！？]+$)", re.S)


def split_sentences(text: str, max_chars: int = 300) -> List[str]:
    """Split into sentence groups of at most ``max_chars`` characters
    (long sentences are hard-split)."""
    sents = [s.strip() for s in _SENT_RE.findall(text) if s.strip()]
    groups: List[str] = []
    cur = ""
    for s in sents:
        if len(s) > max_chars and cur:  # flush before hard-splitting
            groups.append(cur)
            cur = ""
        while len(s) > max_chars:  # pathological sentence: hard split
            groups.append(s[:max_chars])
            s = s[max_chars:]
        if len(cur) + len(s) + 1 <= max_chars:
            cur = (cur + " " + s).strip()
        else:
            if cur:
                groups.append(cur)
            cur = s
    if cur:
        groups.append(cur)
    return groups


def generate_longform(
    model,
    text: str,
    language: str,
    ref_audio,
    ref_text: str,
    *,
    max_chars: int = 300,
    gap_ms: int = 120,
    **gen_kwargs,
) -> Tuple[np.ndarray, int]:
    """Synthesize arbitrarily long text as concatenated sentence groups.
    Returns (waveform, sample_rate)."""
    sr = model.sample_rate
    gap = np.zeros(int(gap_ms / 1000 * sr), np.float32)
    parts: List[np.ndarray] = []
    for i, group in enumerate(split_sentences(text, max_chars)):
        audio_list, sr = model.generate_voice_clone(
            group, language, ref_audio, ref_text, **gen_kwargs)
        if i:
            parts.append(gap)
        parts.append(audio_list[0])
    if not parts:
        return np.zeros(1, np.float32), sr
    return np.concatenate(parts), sr


def generate_longform_streaming(
    model,
    text: str,
    language: str,
    ref_audio,
    ref_text: str,
    *,
    max_chars: int = 300,
    gap_ms: int = 120,
    chunk_size: int = 8,
    **gen_kwargs,
) -> Generator[Tuple[np.ndarray, int, dict], None, None]:
    """Streaming long-form synthesis: chunks flow continuously across
    sentence-group boundaries."""
    sr = model.sample_rate
    gap = np.zeros(int(gap_ms / 1000 * sr), np.float32)
    for i, group in enumerate(split_sentences(text, max_chars)):
        if i:
            yield gap, sr, {"segment": i, "is_gap": True}
        for audio, sr, timing in model.generate_voice_clone_streaming(
            group, language, ref_audio, ref_text, chunk_size=chunk_size,
            **gen_kwargs,
        ):
            timing = dict(timing, segment=i, is_gap=False)
            yield audio, sr, timing
