"""Checkpoint I/O: safetensors ⇄ JAX param pytrees, plus random presets.

Three entry paths for ``from_pretrained`` (reference model.py:71-152 loads via
HF hub; here weights are local-only — zero-egress environment):

  1. ``random:<preset>`` — deterministic random init of a preset architecture
     (tests/benchmarks; same FLOP profile as real weights).
  2. A directory containing ``config.json`` + ``model.safetensors`` in THIS
     framework's canonical flat layout (written by ``save_checkpoint``).
  3. A directory with upstream per-layer torch safetensors — converted via
     ``convert_torch_tree`` (names per SURVEY.md §2.2; per-layer tensors are
     stacked into the layer-stacked [L, ...] arrays used by lax.scan).
"""
from __future__ import annotations

import json
import logging
import re
from pathlib import Path
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import TTSModelConfig
from .presets import get_preset

logger = logging.getLogger(__name__)

SEP = "/"


# ---------------------------------------------------------------------------
# flatten / unflatten
# ---------------------------------------------------------------------------


def flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten(v, f"{prefix}{k}{SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten(v, f"{prefix}{i}{SEP}"))
    else:
        out[prefix[: -len(SEP)]] = np.asarray(tree)
    return out


def unflatten(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split(SEP)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(re.fullmatch(r"\d+", k) for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


# ---------------------------------------------------------------------------
# save / load (canonical format)
# ---------------------------------------------------------------------------


def save_checkpoint(path: str | Path, cfg: TTSModelConfig, bundle: Dict[str, Any]) -> None:
    """bundle: {"talker": ..., "predictor": ..., "codec": ..., "speaker": ...}"""
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps(cfg.to_dict(), indent=2))
    flat = flatten(bundle)
    # bf16 numpy arrays are supported by safetensors via their ml_dtypes repr
    save_file({k: np.asarray(v) for k, v in flat.items()}, str(path / "model.safetensors"))


def load_checkpoint(path: str | Path, dtype=None) -> Tuple[TTSModelConfig, Dict[str, Any]]:
    from safetensors.numpy import load_file

    path = Path(path)
    raw_cfg = json.loads((path / "config.json").read_text())
    # canonical format stores the full nested dict under dataclass field names
    if "talker" in raw_cfg:
        cfg = _cfg_from_canonical(raw_cfg)
    else:
        cfg = TTSModelConfig.from_dict(raw_cfg)
    flat = load_file(str(path / "model.safetensors"))
    bundle = unflatten(dict(flat))
    target = dtype or cfg.jnp_dtype
    bundle = jax.tree.map(
        lambda x: jnp.asarray(x, target) if np.issubdtype(np.asarray(x).dtype, np.floating) else jnp.asarray(x),
        bundle,
    )
    return cfg, bundle


def _cfg_from_canonical(raw: Dict[str, Any]) -> TTSModelConfig:
    import dataclasses

    from .config import (CodecConfig, PredictorConfig, SpeakerEncoderConfig,
                         TalkerConfig)

    def mk(cls, d):
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: (tuple(v) if isinstance(v, list) else v)
                      for k, v in d.items() if k in names})

    top = {k: v for k, v in raw.items()
           if k in {f.name for f in dataclasses.fields(TTSModelConfig)}
           and k not in ("talker", "predictor", "codec", "speaker_encoder")}
    return TTSModelConfig(
        talker=mk(TalkerConfig, raw["talker"]),
        predictor=mk(PredictorConfig, raw["predictor"]),
        codec=mk(CodecConfig, raw["codec"]),
        speaker_encoder=mk(SpeakerEncoderConfig, raw["speaker_encoder"]),
        **top,
    )


# ---------------------------------------------------------------------------
# random init
# ---------------------------------------------------------------------------


def init_random(cfg: TTSModelConfig, seed: int = 0, dtype=None) -> Dict[str, Any]:
    from ..models import codec as codec_lib
    from ..models import predictor as predictor_lib
    from ..models import speaker as speaker_lib
    from ..models import talker as talker_lib

    target = dtype or cfg.jnp_dtype
    key = jax.random.PRNGKey(seed)
    k = jax.random.split(key, 4)
    talker = jax.jit(talker_lib.init_params, static_argnums=(1, 2))(k[0], cfg.talker, target)
    predictor = jax.jit(predictor_lib.init_params, static_argnums=(1, 2, 3))(
        k[1], cfg.predictor, cfg.talker.hidden_size, target
    )
    # codec + speaker run in f32 for waveform fidelity regardless of model dtype
    codec = jax.jit(codec_lib.init_params, static_argnums=(1, 2))(k[2], cfg.codec, jnp.float32)
    speaker = jax.jit(speaker_lib.init_params, static_argnums=(1, 2))(k[3], cfg.speaker_encoder, jnp.float32)
    return {"talker": talker, "predictor": predictor, "codec": codec, "speaker": speaker}


def load_pretrained(model_name: str, dtype=None, seed: int = 0) -> Tuple[TTSModelConfig, Dict[str, Any]]:
    """Resolve a model reference: 'random:<preset>' or a checkpoint dir."""
    if model_name.startswith("random:"):
        cfg = get_preset(model_name.split(":", 1)[1])
        if dtype is not None:
            import dataclasses
            name = {jnp.bfloat16: "bfloat16", jnp.float32: "float32", jnp.float16: "float16"}[dtype]
            cfg = dataclasses.replace(cfg, dtype=name)
        return cfg, init_random(cfg, seed=seed, dtype=dtype)
    p = Path(model_name)
    if p.is_dir():
        return load_checkpoint(p, dtype=dtype)
    raise FileNotFoundError(
        f"Model '{model_name}' not found. Use 'random:<preset>' "
        f"or a local checkpoint directory (no network access in this environment)."
    )


# ---------------------------------------------------------------------------
# upstream torch-layout conversion (best-effort; SURVEY.md §2.2 name surface)
# ---------------------------------------------------------------------------

_TORCH_LAYER_RE = re.compile(
    r"talker\.model\.layers\.(\d+)\.(self_attn\.(?:q|k|v|o)_proj\.weight|"
    r"self_attn\.(?:q|k)_norm\.weight|input_layernorm\.weight|"
    r"post_attention_layernorm\.weight|mlp\.(?:gate|up|down)_proj\.weight)"
)

_BLOCK_KEY = {
    "self_attn.q_proj.weight": "q_proj",
    "self_attn.k_proj.weight": "k_proj",
    "self_attn.v_proj.weight": "v_proj",
    "self_attn.o_proj.weight": "o_proj",
    "self_attn.q_norm.weight": "q_norm",
    "self_attn.k_norm.weight": "k_norm",
    "input_layernorm.weight": "input_norm",
    "post_attention_layernorm.weight": "post_norm",
    "mlp.gate_proj.weight": "gate_proj",
    "mlp.up_proj.weight": "up_proj",
    "mlp.down_proj.weight": "down_proj",
}


def convert_torch_tree(named_tensors: Dict[str, np.ndarray], num_layers: int) -> Dict[str, Any]:
    """Stack upstream per-layer talker tensors into the layer-stacked layout.

    Linear weights are transposed (torch stores [out,in]; we use [in,out]).
    Only the talker block-stack is handled here; embedding/head tensors map
    1:1 by name and are left to the caller.
    """
    per_layer: Dict[str, list] = {v: [None] * num_layers for v in _BLOCK_KEY.values()}
    for name, tensor in named_tensors.items():
        m = _TORCH_LAYER_RE.fullmatch(name)
        if not m:
            continue
        li = int(m.group(1))
        key = _BLOCK_KEY[m.group(2)]
        t = np.asarray(tensor)
        if key.endswith("_proj"):
            t = t.T
        per_layer[key][li] = t
    return {k: np.stack(v) for k, v in per_layer.items() if all(x is not None for x in v)}
