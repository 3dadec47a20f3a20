"""Audio-fidelity metrics + the int8 quantization quality gate.

The int8 / w8a8 / kv_quant headline numbers were speed-only (VERDICT r2
weak-point 3); this module makes their quality cost measurable TODAY with
random weights and re-runnable the day real weights land:

  - ``waveform_snr_db`` / ``log_mel_distance`` — fidelity of the quantized
    model's audio against the bf16 model's audio at identical seeds;
  - ``token_agreement`` — how much quantization perturbs the decode
    decisions themselves (exact-match rate over the [steps, 16] codec ids,
    plus the first step where codebook-0 diverges);
  - ``quant_quality`` — the full A/B: two models, same weights/seed/PRNG
    stream, greedy codebook-0, fixed generation length.

The reference handles audio-quality regression with committed sample WAVs +
seeds rather than assertions (samples/parity/README.md); this adds a numeric
proxy on top so the bench artifacts carry a ``quality_vs_bf16`` record
(benchmarks/quant_quality.py) and tests can assert a floor.

Everything is pure numpy on host — no device work beyond the generations.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

_SNR_CAP_DB = 99.0


def waveform_snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """SNR of ``test`` against ``ref`` (dB), truncated to the common length.
    Identical signals cap at 99 dB."""
    ref = np.asarray(ref, np.float64).ravel()
    test = np.asarray(test, np.float64).ravel()
    n = min(len(ref), len(test))
    if n == 0:
        return 0.0
    ref, test = ref[:n], test[:n]
    sig = float(np.sum(ref * ref))
    err = float(np.sum((ref - test) ** 2))
    if err <= sig * 10 ** (-_SNR_CAP_DB / 10):
        return _SNR_CAP_DB
    if sig == 0.0:
        return 0.0
    return float(10.0 * np.log10(sig / err))


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


def mel_filterbank(sr: int, n_fft: int, n_mels: int,
                   fmin: float = 0.0, fmax: Optional[float] = None) -> np.ndarray:
    """[n_mels, n_fft//2+1] triangular HTK-mel filterbank."""
    fmax = fmax or sr / 2
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    bins = np.floor((n_fft + 1) * hz_pts / sr).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        lo, ctr, hi = bins[i], bins[i + 1], bins[i + 2]
        for b in range(lo, ctr):
            if ctr > lo:
                fb[i, b] = (b - lo) / (ctr - lo)
        for b in range(ctr, hi):
            if hi > ctr:
                fb[i, b] = (hi - b) / (hi - ctr)
    return fb


def log_mel(wav: np.ndarray, sr: int = 24_000, n_fft: int = 1024,
            hop: int = 256, n_mels: int = 80) -> np.ndarray:
    """[frames, n_mels] log-mel spectrogram (numpy STFT, Hann window)."""
    wav = np.asarray(wav, np.float64).ravel()
    if len(wav) < n_fft:
        wav = np.pad(wav, (0, n_fft - len(wav)))
    n_frames = 1 + (len(wav) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = wav[idx] * np.hanning(n_fft)[None, :]
    spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
    mel = spec @ mel_filterbank(sr, n_fft, n_mels).T
    return np.log(np.maximum(mel, 1e-10))


def log_mel_distance(ref: np.ndarray, test: np.ndarray,
                     sr: int = 24_000) -> float:
    """Mean absolute log-mel difference over the common frame count — the
    standard "does it sound the same" proxy (robust to phase, unlike SNR)."""
    a, b = log_mel(ref, sr), log_mel(test, sr)
    n = min(len(a), len(b))
    if n == 0:
        return 0.0
    return float(np.mean(np.abs(a[:n] - b[:n])))


def token_agreement(ids_a: np.ndarray, ids_b: np.ndarray) -> Dict[str, float]:
    """Exact-match stats between two [steps, 16] codec-id matrices."""
    a, b = np.asarray(ids_a), np.asarray(ids_b)
    n = min(len(a), len(b))
    if n == 0:
        return {"match_rate": 0.0, "cb0_match_rate": 0.0,
                "first_divergence_step": 0, "steps_compared": 0}
    a, b = a[:n], b[:n]
    cb0_neq = np.nonzero(a[:, 0] != b[:, 0])[0]
    return {
        "match_rate": float(np.mean(a == b)),
        "cb0_match_rate": float(np.mean(a[:, 0] == b[:, 0])),
        "first_divergence_step": int(cb0_neq[0]) if len(cb0_neq) else n,
        "steps_compared": n,
    }


def fixed_generation(model, text, ref_audio, ref_text, language, steps, seed):
    """Greedy-codebook-0, fixed-length generation returning (ids, audio).
    A FIXED PRNG key (not the model's stream) keeps the predictor's sampled
    codebooks comparable across the two models."""
    import jax

    from ..runtime import loops

    embeds, trailing, tpe, ref_codes = model._prepare_clone(
        text, ref_audio, ref_text, language, True, True, True, None)
    # min == max: EOS suppressed throughout, so both runs emit exactly
    # ``steps`` frames and every metric is length-aligned
    pol, ppol = model._policies(
        temperature=0.9, top_k=50, top_p=1.0, do_sample=False,
        repetition_penalty=1.05, min_new_tokens=steps)
    model._warmup(embeds.shape[1], trailing.shape[1], pol, ppol)
    ids, timing = loops.fast_generate(
        model.engine, embeds, trailing, tpe, key=jax.random.PRNGKey(seed),
        max_new_tokens=steps, policy=pol, pred_policy=ppol)
    ids = np.asarray(ids)
    audio = np.asarray(model.vocoder.decode(ids))
    return ids, audio


def quant_quality(model_ref, model_q, *, text: str, ref_audio, ref_text: str,
                  language: str = "English", steps: int = 48,
                  seed: int = 1337) -> Dict:
    """A/B fidelity of ``model_q`` against ``model_ref`` (same weights/seed,
    e.g. bf16 vs int8): token agreement + waveform SNR + log-mel distance.
    Returns a JSON-ready dict for the ``quality_vs_bf16`` bench field."""
    ids_r, wav_r = fixed_generation(
        model_ref, text, ref_audio, ref_text, language, steps, seed)
    ids_q, wav_q = fixed_generation(
        model_q, text, ref_audio, ref_text, language, steps, seed)
    out = {
        "steps": int(steps),
        "waveform_snr_db": round(waveform_snr_db(wav_r, wav_q), 2),
        "log_mel_dist": round(log_mel_distance(wav_r, wav_q,
                                               model_ref.sample_rate), 4),
    }
    out.update(token_agreement(ids_r, ids_q))
    return out
