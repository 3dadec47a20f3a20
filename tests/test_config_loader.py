"""Config + checkpoint loader tests."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.core.config import CodecConfig, TTSModelConfig
from qwen3tts_tpu.core.loader import (
    flatten, load_checkpoint, save_checkpoint, unflatten, load_pretrained,
)
from qwen3tts_tpu.core.presets import PRESETS, get_preset


def test_presets_consistent():
    for name, cfg in PRESETS.items():
        assert cfg.codec.total_upsample == cfg.codec.sample_rate // cfg.codec.frame_rate
        assert sum(cfg.talker.mrope_section) == cfg.talker.head_dim // 2
        assert cfg.predictor.num_codebooks == 15
        assert cfg.predictor.max_seq == 17  # reference predictor_graph.py:46
        for tid in (cfg.tts_bos_token_id, cfg.tts_eos_token_id, cfg.tts_pad_token_id):
            assert 0 <= tid < cfg.talker.text_vocab_size, (name, tid)


def test_codec_upsample_validation():
    with pytest.raises(ValueError):
        CodecConfig(upsample_rates=(2, 2), upsampling_ratios=(2, 2))


def test_config_hashable_and_static_arg():
    cfg = get_preset("tiny").talker
    assert hash(cfg) == hash(dataclasses.replace(cfg))
    {cfg: 1}  # usable as dict key


def test_from_dict_hf_style():
    raw = {
        "tts_model_type": "custom_voice",
        "talker_config": {"hidden_size": 128, "num_hidden_layers": 4,
                          "code_predictor_config": {"hidden_size": 64}},
        "tts_pad_token_id": 7,
    }
    cfg = TTSModelConfig.from_dict(raw)
    assert cfg.model_type == "custom_voice"
    assert cfg.talker.hidden_size == 128
    assert cfg.predictor.hidden_size == 64
    assert cfg.tts_pad_token_id == 7


def test_flatten_roundtrip():
    tree = {"a": {"b": np.ones((2,)), "c": [np.zeros((1,)), np.full((3,), 2.0)]}}
    flat = flatten(tree)
    assert set(flat) == {"a/b", "a/c/0", "a/c/1"}
    back = unflatten(flat)
    assert isinstance(back["a"]["c"], list)
    np.testing.assert_array_equal(back["a"]["c"][1], tree["a"]["c"][1])


def test_checkpoint_roundtrip(tmp_path, tiny_cfg):
    from qwen3tts_tpu.core.loader import init_random

    bundle = init_random(tiny_cfg, seed=3)
    save_checkpoint(tmp_path / "ckpt", tiny_cfg, bundle)
    cfg2, bundle2 = load_checkpoint(tmp_path / "ckpt")
    assert cfg2.talker.hidden_size == tiny_cfg.talker.hidden_size
    assert cfg2.codec.upsample_rates == tiny_cfg.codec.upsample_rates
    a = flatten(bundle)
    b = flatten(jax.tree.map(np.asarray, bundle2))
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_load_pretrained_missing_path_errors():
    with pytest.raises(FileNotFoundError):
        load_pretrained("/nonexistent/model")
    with pytest.raises(KeyError):
        load_pretrained("random:nope")


def test_torch_layout_roundtrip(tiny_cfg):
    """export_torch_layout ∘ convert_torch_checkpoint == identity on the
    FULL four-half bundle (validates the upstream-name mapping; the
    through-disk version lives in test_torch_checkpoint.py)."""
    import jax

    from qwen3tts_tpu.core.loader import (convert_torch_checkpoint,
                                          export_torch_layout, init_random)

    bundle = jax.tree.map(np.asarray, init_random(tiny_cfg, seed=11))
    torch_style = export_torch_layout(bundle, tiny_cfg)
    back = convert_torch_checkpoint(torch_style, tiny_cfg)
    a, b = flatten(bundle), flatten(back)
    assert set(a) == set(b), set(a) ^ set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
