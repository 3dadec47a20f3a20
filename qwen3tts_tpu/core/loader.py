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

import functools
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
    # bf16 numpy arrays are supported by safetensors via their ml_dtypes repr.
    # ascontiguousarray: safetensors.numpy silently serializes the BASE buffer
    # of non-contiguous (e.g. transposed) arrays, scrambling the data.
    save_file({k: np.ascontiguousarray(v) for k, v in flat.items()},
              str(path / "model.safetensors"))


def _load_sharded_tensors(path: Path) -> Dict[str, np.ndarray]:
    """Read all weight tensors from a checkpoint dir: single
    ``model.safetensors``, or HF multi-file shards resolved through
    ``model.safetensors.index.json`` (falling back to a glob)."""
    from safetensors.numpy import load_file

    single = path / "model.safetensors"
    if single.exists():
        return dict(load_file(str(single)))
    index = path / "model.safetensors.index.json"
    if index.exists():
        weight_map = json.loads(index.read_text())["weight_map"]
        shards = sorted(set(weight_map.values()))
    else:
        shards = sorted(p.name for p in path.glob("model-*-of-*.safetensors"))
    if not shards:
        raise FileNotFoundError(f"no safetensors weights found in {path}")
    out: Dict[str, np.ndarray] = {}
    for shard in shards:
        out.update(load_file(str(path / shard)))
    return out


def load_checkpoint(path: str | Path, dtype=None) -> Tuple[TTSModelConfig, Dict[str, Any]]:
    """Load either layout (sniffed from config.json — reference
    from_pretrained accepts the upstream HF checkpoint dir, model.py:71-152):

      - canonical (this framework's ``save_checkpoint``): config.json carries
        the full nested dataclass dict under a top-level "talker" key;
      - upstream HF torch layout: "talker_config" key, torch tensor names in
        [out,in]/[Cout,Cin,K] layout, optionally sharded across
        ``model-XXXXX-of-YYYYY.safetensors`` files.
    """
    path = Path(path)
    raw_cfg = json.loads((path / "config.json").read_text())
    named = _load_sharded_tensors(path)
    if "talker" in raw_cfg:  # canonical format: flat names match our pytree
        cfg = _cfg_from_canonical(raw_cfg)
        bundle = unflatten(named)
    else:  # upstream torch layout → convert
        cfg = TTSModelConfig.from_dict(raw_cfg)
        bundle = convert_torch_checkpoint(named, cfg)
    target = dtype or cfg.jnp_dtype
    # dtype-cast on HOST, then ONE batched tree transfer (per-leaf transfers
    # each pay a full round trip on tunneled runtimes).  Only the talker /
    # predictor halves are cast to the model dtype; the codec and speaker
    # encoder keep their stored precision (waveform fidelity — init_random
    # makes the same split).
    from ..ops.initrand import fast_astype

    def cast_half(half, t):
        return jax.tree.map(
            lambda x: fast_astype(np.asarray(x), t)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else np.asarray(x),
            half,
        )

    bundle = {
        "talker": cast_half(bundle["talker"], target),
        "predictor": cast_half(bundle["predictor"], target),
        "codec": jax.tree.map(np.asarray, bundle["codec"]),
        "speaker": jax.tree.map(np.asarray, bundle["speaker"]),
    }
    from .packed_transfer import device_put_tree

    return cfg, device_put_tree(bundle)


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

    # ONE jitted program initializes the whole bundle ON DEVICE: this host has
    # a single starved CPU core (host-side generation takes minutes) and every
    # separate device program costs seconds of dispatch latency; the compiled
    # init executable is persistently cached per (cfg, dtype).
    @functools.partial(jax.jit, static_argnums=(1,))
    def _init_bundle(key, target_name):
        t = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
             "float16": jnp.float16}[target_name]
        k = jax.random.split(key, 4)
        return {
            "talker": talker_lib.init_params(k[0], cfg.talker, t),
            "predictor": predictor_lib.init_params(
                k[1], cfg.predictor, cfg.talker.hidden_size, t),
            # codec + speaker stay f32 for waveform fidelity
            "codec": codec_lib.init_params(k[2], cfg.codec, jnp.float32),
            "speaker": speaker_lib.init_params(k[3], cfg.speaker_encoder,
                                               jnp.float32),
        }

    name = {jnp.bfloat16: "bfloat16", jnp.float32: "float32",
            jnp.float16: "float16"}[jnp.dtype(target).type if not isinstance(target, str) else jnp.dtype(target).type]
    return _init_bundle(jax.random.PRNGKey(seed), name)


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


def convert_torch_tree(named_tensors: Dict[str, np.ndarray], num_layers: int,
                       prefix: str = "talker.model") -> Dict[str, Any]:
    """Stack upstream per-layer decoder tensors into the layer-stacked layout.

    Linear weights are transposed (torch stores [out,in]; we use [in,out]).
    """
    layer_re = re.compile(
        re.escape(prefix)
        + r"\.layers\.(\d+)\.(self_attn\.(?:q|k|v|o)_proj\.weight|"
        r"self_attn\.(?:q|k)_norm\.weight|input_layernorm\.weight|"
        r"post_attention_layernorm\.weight|mlp\.(?:gate|up|down)_proj\.weight)"
    )
    per_layer: Dict[str, list] = {v: [None] * num_layers for v in _BLOCK_KEY.values()}
    for name, tensor in named_tensors.items():
        m = layer_re.fullmatch(name)
        if not m:
            continue
        li = int(m.group(1))
        key = _BLOCK_KEY[m.group(2)]
        t = np.asarray(tensor)
        if key.endswith("_proj"):
            t = t.T
        per_layer[key][li] = t
    stacked = {k: np.stack(v) for k, v in per_layer.items()
               if all(x is not None for x in v)}
    # checkpoints keep the upstream unfused names; the runtime uses fused
    # qkv/gateup matmuls (models/layers.py)
    if {"q_proj", "k_proj", "v_proj"} <= set(stacked):
        stacked["qkv_proj"] = np.concatenate(
            [stacked.pop("q_proj"), stacked.pop("k_proj"), stacked.pop("v_proj")],
            axis=-1)
    if {"gate_proj", "up_proj"} <= set(stacked):
        stacked["gateup_proj"] = np.concatenate(
            [stacked.pop("gate_proj"), stacked.pop("up_proj")], axis=-1)
    return stacked


# name → (our path, transpose?) for the non-layer tensors
_TALKER_TOP = {
    "talker.model.codec_embedding.weight": ("codec_embedding", False),
    "talker.model.text_embedding.weight": ("text_embedding", False),
    "talker.text_projection.weight": ("text_projection/w", True),
    "talker.text_projection.bias": ("text_projection/b", False),
    "talker.model.norm.weight": ("final_norm", False),
    "talker.codec_head.weight": ("codec_head", True),
    "talker.spk_proj.weight": ("spk_proj/w", True),
    "talker.spk_proj.bias": ("spk_proj/b", False),
}
_PRED_TOP = {
    "talker.code_predictor.small_to_mtp_projection.weight": ("small_to_mtp/w", True),
    "talker.code_predictor.small_to_mtp_projection.bias": ("small_to_mtp/b", False),
    "talker.code_predictor.model.norm.weight": ("final_norm", False),
}


# ---------------------------------------------------------------------------
# generic torch-layout bijection for the codec / speaker halves
#
# The upstream hides these models behind ``speech_tokenizer`` /
# ``create_voice_clone_prompt`` (SURVEY.md §2.2), so their exact state-dict
# names are not pinned by the reference repo.  The mapping below is the
# DESIGNED landing point: a systematic bijection between our pytree and torch
# naming/layout conventions ([out,in] linears, [Cout,Cin,K] convs, ModuleList
# indices).  When real weights land, only the name prefix table needs
# adjusting; the mechanics (stacking, transposes, shard handling) are proven
# by tests/test_torch_checkpoint.py round-trips.
# ---------------------------------------------------------------------------


def export_aux_tree(tree: Any, prefix: str) -> Dict[str, np.ndarray]:
    """Our pytree → torch-named tensors.  Leaf 'w' → '.weight' (rank-2
    transposed to [out,in]; rank-3 conv to [Cout,Cin,K]); 'b' → '.bias';
    every other leaf keeps its name and layout."""
    out: Dict[str, np.ndarray] = {}
    for path, leaf in flatten(tree, prefix + SEP).items():
        parts = path.split(SEP)
        name = parts[-1]
        t = np.asarray(leaf)
        if name == "w":
            parts[-1] = "weight"
            t = t.transpose(2, 1, 0) if t.ndim == 3 else t.T
        elif name == "b":
            parts[-1] = "bias"
        out[".".join(parts)] = t
    return out


def convert_aux_tree(named_tensors: Dict[str, np.ndarray], prefix: str) -> Any:
    """Inverse of ``export_aux_tree``: torch-named tensors under ``prefix`` →
    our nested pytree.  Returns None if no tensors carry the prefix."""
    flat: Dict[str, np.ndarray] = {}
    pfx = prefix + "."
    for name, tensor in named_tensors.items():
        if not name.startswith(pfx):
            continue
        parts = name[len(pfx):].split(".")
        t = np.asarray(tensor)
        if parts[-1] == "weight":
            parts[-1] = "w"
            t = t.transpose(2, 1, 0) if t.ndim == 3 else t.T
        elif parts[-1] == "bias":
            parts[-1] = "b"
        flat[SEP.join(parts)] = t
    return unflatten(flat) if flat else None


def convert_torch_checkpoint(
    named_tensors: Dict[str, np.ndarray], cfg: TTSModelConfig
) -> Dict[str, Any]:
    """Conversion of an upstream torch-layout state dict into a full
    {'talker', 'predictor', 'codec', 'speaker'} bundle (SURVEY.md §2.2
    surface: per-codebook ModuleLists become stacked arrays; per-layer decoder
    tensors become lax.scan-ready [L, ...] stacks; codec/speaker trees convert
    through the generic bijection above)."""
    talker: Dict[str, Any] = {
        "blocks": convert_torch_tree(named_tensors, cfg.talker.num_hidden_layers,
                                     "talker.model"),
    }
    predictor: Dict[str, Any] = {
        "blocks": convert_torch_tree(named_tensors, cfg.predictor.num_hidden_layers,
                                     "talker.code_predictor.model"),
    }
    flat_t: Dict[str, np.ndarray] = {}
    flat_p: Dict[str, np.ndarray] = {}
    for name, tensor in named_tensors.items():
        t = np.asarray(tensor)
        if name in _TALKER_TOP:
            path, transpose = _TALKER_TOP[name]
            flat_t[path] = t.T if transpose else t
        elif name in _PRED_TOP:
            path, transpose = _PRED_TOP[name]
            flat_p[path] = t.T if transpose else t

    # per-codebook ModuleLists → stacked arrays
    nc = cfg.predictor.num_codebooks
    heads = [named_tensors.get(f"talker.code_predictor.lm_head.{i}.weight")
             for i in range(nc)]
    if all(h is not None for h in heads):
        flat_p["lm_heads"] = np.stack([np.asarray(h).T for h in heads])
    embeds = [named_tensors.get(
        f"talker.code_predictor.model.codec_embedding.{i}.weight")
        for i in range(nc)]
    if all(e is not None for e in embeds):
        flat_p["codec_embeddings"] = np.stack([np.asarray(e) for e in embeds])

    talker.update(unflatten(flat_t))
    predictor.update(unflatten(flat_p))

    codec = convert_aux_tree(named_tensors, "speech_tokenizer")
    speaker = convert_aux_tree(named_tensors, "speaker_encoder")
    missing = [n for n, half in (("speech_tokenizer", codec),
                                 ("speaker_encoder", speaker)) if half is None]
    if missing:
        raise ValueError(
            f"checkpoint is missing the {missing} tensor group(s); a partial "
            "model cannot synthesize audio. Convert/merge all four sub-models "
            "into one checkpoint dir (see core/loader.py docstring)."
        )
    return {"talker": talker, "predictor": predictor,
            "codec": codec, "speaker": speaker}


def export_torch_layout(bundle: Dict[str, Any], cfg: TTSModelConfig) -> Dict[str, np.ndarray]:
    """Inverse of convert_torch_checkpoint (talker+predictor halves) — used by
    the round-trip test and for interop with torch tooling."""
    out: Dict[str, np.ndarray] = {}

    def put_blocks(blocks, prefix, q_dim, kv_dim, inter):
        inv = {v: k for k, v in _BLOCK_KEY.items()}
        qkv = np.asarray(blocks["qkv_proj"])
        gu = np.asarray(blocks["gateup_proj"])
        unfused = dict(blocks)
        unfused["q_proj"] = qkv[..., :q_dim]
        unfused["k_proj"] = qkv[..., q_dim : q_dim + kv_dim]
        unfused["v_proj"] = qkv[..., q_dim + kv_dim :]
        unfused["gate_proj"] = gu[..., :inter]
        unfused["up_proj"] = gu[..., inter:]
        L = qkv.shape[0]
        for our, torch_key in inv.items():
            arr = np.asarray(unfused[our])
            for li in range(L):
                t = arr[li]
                if our.endswith("_proj"):
                    t = t.T
                out[f"{prefix}.layers.{li}.{torch_key}"] = t

    tk, pd = cfg.talker, cfg.predictor
    put_blocks(bundle["talker"]["blocks"], "talker.model",
               tk.num_attention_heads * tk.head_dim,
               tk.num_key_value_heads * tk.head_dim, tk.intermediate_size)
    put_blocks(bundle["predictor"]["blocks"], "talker.code_predictor.model",
               pd.num_attention_heads * pd.head_dim,
               pd.num_key_value_heads * pd.head_dim, pd.intermediate_size)
    for name, (path, transpose) in _TALKER_TOP.items():
        leaf = bundle["talker"]
        for part in path.split("/"):
            leaf = leaf[part]
        out[name] = np.asarray(leaf).T if transpose else np.asarray(leaf)
    for name, (path, transpose) in _PRED_TOP.items():
        leaf = bundle["predictor"]
        for part in path.split("/"):
            leaf = leaf[part]
        out[name] = np.asarray(leaf).T if transpose else np.asarray(leaf)
    lm = np.asarray(bundle["predictor"]["lm_heads"])
    ce = np.asarray(bundle["predictor"]["codec_embeddings"])
    for i in range(lm.shape[0]):
        out[f"talker.code_predictor.lm_head.{i}.weight"] = lm[i].T
        out[f"talker.code_predictor.model.codec_embedding.{i}.weight"] = ce[i]
    if "codec" in bundle:
        out.update(export_aux_tree(bundle["codec"], "speech_tokenizer"))
    if "speaker" in bundle:
        out.update(export_aux_tree(bundle["speaker"], "speaker_encoder"))
    return out


def export_torch_checkpoint(
    path: str | Path,
    cfg: TTSModelConfig,
    bundle: Dict[str, Any],
    num_shards: int = 1,
    tokenizer_json: str | None = None,
) -> None:
    """Write an upstream-HF-layout checkpoint dir: HF-style config.json,
    torch-named/[out,in]-layout tensors across ``num_shards`` safetensors
    files with an index.json, optional tokenizer.json.  This is the one-command
    export whose inverse is ``load_checkpoint``'s torch branch — and the
    format golden fixtures/conversions are tested against."""
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps(cfg.to_hf_dict(), indent=2))
    # ascontiguousarray: the export transposes to torch layout, and
    # safetensors.numpy silently serializes base buffers of views
    named = {k: np.ascontiguousarray(v)
             for k, v in export_torch_layout(bundle, cfg).items()}
    names = sorted(named)
    if num_shards <= 1:
        save_file({n: named[n] for n in names}, str(path / "model.safetensors"))
    else:
        per = -(-len(names) // num_shards)
        weight_map: Dict[str, str] = {}
        for si in range(num_shards):
            shard_names = names[si * per : (si + 1) * per]
            fname = f"model-{si + 1:05d}-of-{num_shards:05d}.safetensors"
            save_file({n: named[n] for n in shard_names}, str(path / fname))
            weight_map.update({n: fname for n in shard_names})
        (path / "model.safetensors.index.json").write_text(
            json.dumps({"metadata": {}, "weight_map": weight_map}, indent=2))
    if tokenizer_json:
        (path / "tokenizer.json").write_text(Path(tokenizer_json).read_text())
