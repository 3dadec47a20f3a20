"""x-vector speaker encoder (ECAPA-TDNN style) → 2048-dim embedding.

Reference contract: ``create_voice_clone_prompt(x_vector_only_mode=True)``
returns a 2048-dim bf16 speaker embedding (~4 KB artifact,
examples/extract_speaker.py:32-39, README.md:411).  The upstream network is
not visible in the reference repo; this is a first-party ECAPA-style design:
log-mel (25 ms / 10 ms @ 16 kHz) → dilated TDNN blocks → attentive statistics
pooling → linear → ``emb_dim``.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import SpeakerEncoderConfig
from ..ops.initrand import normal as _init_normal

Params = Dict

_N_FFT = 512
_WIN = 400
_HOP = 160


def _mel_filterbank(n_mels: int, sr: int, n_fft: int = _N_FFT) -> np.ndarray:
    """[n_fft//2+1, n_mels] Slaney-style mel filter matrix (host constant)."""
    fmin, fmax = 0.0, sr / 2
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)
    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    freqs = mel_to_hz(mels)
    bins = np.floor((n_fft + 1) * freqs / sr).astype(int)
    fb = np.zeros((n_fft // 2 + 1, n_mels), np.float32)
    for m in range(1, n_mels + 1):
        lo, c, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, c):
            if c > lo:
                fb[k, m - 1] = (k - lo) / (c - lo)
        for k in range(c, hi):
            if hi > c:
                fb[k, m - 1] = (hi - k) / (hi - c)
    return fb


def log_mel(wav: jnp.ndarray, n_mels: int, sr: int) -> jnp.ndarray:
    """wav [N] float32 @16k → log-mel [frames, n_mels]."""
    n = (wav.shape[0] - _WIN) // _HOP + 1
    if n < 1:
        wav = jnp.pad(wav, (0, _WIN - wav.shape[0]))
        n = 1
    idx = jnp.arange(n)[:, None] * _HOP + jnp.arange(_WIN)[None, :]
    frames = wav[idx] * jnp.hanning(_WIN)
    spec = jnp.abs(jnp.fft.rfft(frames, n=_N_FFT, axis=-1)) ** 2
    fb = jnp.asarray(_mel_filterbank(n_mels, sr))
    mel = spec @ fb
    return jnp.log(jnp.maximum(mel, 1e-10))


def init_params(key: jax.Array, cfg: SpeakerEncoderConfig, dtype=jnp.float32) -> Params:
    C = cfg.channels
    k = jax.random.split(key, 10)

    def conv(key_, K, cin, cout):
        return {"w": _init_normal(key_, (K, cin, cout), (K * cin) ** -0.5, dtype),
                "b": jnp.zeros(cout, dtype)}

    blocks = []
    for i in range(cfg.num_blocks):
        blocks.append(
            {
                "conv": conv(k[1 + i], cfg.kernel_sizes[min(i + 1, len(cfg.kernel_sizes) - 1)], C, C),
                "pw": conv(k[4 + i], 1, C, C),
            }
        )
    cat_dim = C * (cfg.num_blocks + 1)
    return {
        "in_conv": conv(k[0], cfg.kernel_sizes[0], cfg.mel_bins, C),
        "blocks": blocks,
        "cat_conv": conv(k[7], 1, cat_dim, C),
        "att_w1": conv(k[8], 1, C, cfg.attention_channels),
        "att_w2": conv(k[9], 1, cfg.attention_channels, C),
        "out": {
            "w": _init_normal(jax.random.fold_in(key, 99), (2 * C, cfg.emb_dim),
                              (2 * C) ** -0.5, dtype),
            "b": jnp.zeros((cfg.emb_dim,), dtype),
        },
    }


def _conv1d(x, p, dilation=1):
    K = p["w"].shape[0]
    pad = (K - 1) * dilation // 2
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1,), padding=[(pad, (K - 1) * dilation - pad)],
        rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype) + p["b"]


def embed(params: Params, cfg: SpeakerEncoderConfig, wav16k: jnp.ndarray) -> jnp.ndarray:
    """wav [N] float32 @16 kHz → speaker embedding [emb_dim]."""
    mel = log_mel(wav16k.astype(jnp.float32), cfg.mel_bins, cfg.sample_rate)
    mel = mel - mel.mean(axis=0, keepdims=True)  # CMN
    x = mel[None].astype(params["in_conv"]["w"].dtype)  # [1, T, mel]

    x = jax.nn.relu(_conv1d(x, params["in_conv"]))
    feats = [x]
    for i, blk in enumerate(params["blocks"]):
        h = jax.nn.relu(_conv1d(x, blk["conv"], dilation=cfg.dilations[min(i + 1, len(cfg.dilations) - 1)]))
        h = jax.nn.relu(_conv1d(h, blk["pw"]))
        x = x + h
        feats.append(x)
    x = jnp.concatenate(feats, axis=-1)
    x = jax.nn.relu(_conv1d(x, params["cat_conv"]))  # [1, T, C]

    # attentive statistics pooling
    a = jnp.tanh(_conv1d(x, params["att_w1"]))
    a = _conv1d(a, params["att_w2"])  # [1, T, C]
    a = jax.nn.softmax(a.astype(jnp.float32), axis=1)
    xf = x.astype(jnp.float32)
    mean = jnp.sum(a * xf, axis=1)  # [1, C]
    var = jnp.sum(a * xf * xf, axis=1) - mean**2
    std = jnp.sqrt(jnp.maximum(var, 1e-9))
    stats = jnp.concatenate([mean, std], axis=-1).astype(x.dtype)  # [1, 2C]

    out = stats @ params["out"]["w"] + params["out"]["b"]
    emb = out[0]
    return emb / jnp.maximum(jnp.linalg.norm(emb.astype(jnp.float32)), 1e-9).astype(emb.dtype)
