"""Prompt-assembly layout tests (reference layer-3 idea: isolate prompt
construction correctness from kernel numerics, test_e2e_parity.py:914-1017)."""
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.api.prompt import PromptError, build_talker_inputs
from qwen3tts_tpu.api.tokenizer import TextTokenizer


@pytest.fixture(scope="module")
def tok(tiny_cfg):
    return TextTokenizer(vocab_size=tiny_cfg.talker.text_vocab_size)


def _build(tiny_models, tiny_cfg, **kw):
    tp, pp = tiny_models
    return build_talker_inputs(tp, pp, tiny_cfg, **kw)


def test_streaming_layout_lengths(tiny_models, tiny_cfg, tok):
    ids = tok.build_assistant_ids("abcde")  # 3 + 5 + 5 = 13 tokens
    n_text = ids.shape[1] - 8
    embeds, trailing, tpe = _build(tiny_models, tiny_cfg, input_ids=ids,
                                   language="English")
    # role(3) + head(think4 + pad..bos over len-2=4... ) :
    # think block=4 (lang path), pad, bos => codec_input len 6, head=5, +first text
    assert embeds.shape[1] == 3 + 5 + 1
    # trailing = text[1:] + tts_eos
    assert trailing.shape[1] == (n_text - 1) + 1
    assert tpe.shape == (1, 1, tiny_cfg.talker.hidden_size)


def test_auto_language_shortens_think_block(tiny_models, tiny_cfg, tok):
    ids = tok.build_assistant_ids("abcde")
    e_auto, _, _ = _build(tiny_models, tiny_cfg, input_ids=ids, language="Auto")
    e_en, _, _ = _build(tiny_models, tiny_cfg, input_ids=ids, language="English")
    assert e_en.shape[1] == e_auto.shape[1] + 1  # lang id adds one position


def test_speaker_embed_adds_position(tiny_models, tiny_cfg, tok):
    ids = tok.build_assistant_ids("abc")
    spk = jnp.zeros((tiny_cfg.talker.hidden_size,), jnp.float32)
    e0, _, _ = _build(tiny_models, tiny_cfg, input_ids=ids, language="English")
    e1, _, _ = _build(tiny_models, tiny_cfg, input_ids=ids, language="English",
                      spk_embedding=spk)
    assert e1.shape[1] == e0.shape[1] + 1


def test_non_streaming_packs_text(tiny_models, tiny_cfg, tok):
    """non_streaming_mode packs full text + tts_eos into the prefill
    (reference model.py:472-504) and trailing collapses to tts_pad."""
    ids = tok.build_assistant_ids("abcdefgh")
    n_text = ids.shape[1] - 8
    e_s, tr_s, _ = _build(tiny_models, tiny_cfg, input_ids=ids, language="English")
    e_ns, tr_ns, tpe = _build(tiny_models, tiny_cfg, input_ids=ids,
                              language="English", non_streaming_mode=True)
    assert e_ns.shape[1] == e_s.shape[1] - 1 + (n_text + 1) + 1
    assert tr_ns.shape[1] == 1
    np.testing.assert_array_equal(np.asarray(tr_ns), np.asarray(tpe))


def test_instruct_prepends_exactly(tiny_models, tiny_cfg, tok):
    """Instruct prepends exactly len(instruct_ids) embeds, suffix unchanged
    (reference test :1020-1049)."""
    ids = tok.build_assistant_ids("abc")
    instr = tok.build_instruct_ids("slow")
    e0, _, _ = _build(tiny_models, tiny_cfg, input_ids=ids, language="English")
    e1, _, _ = _build(tiny_models, tiny_cfg, input_ids=ids, language="English",
                      instruct_ids=instr)
    assert e1.shape[1] == e0.shape[1] + instr.shape[1]
    np.testing.assert_allclose(np.asarray(e1[:, instr.shape[1]:]),
                               np.asarray(e0), atol=1e-6)


def test_icl_layout(tiny_models, tiny_cfg, tok):
    ids = tok.build_assistant_ids("abcdefgh")
    ref_ids = tok.build_ref_ids("xyz")
    Tr = 6
    ref_codes = np.random.RandomState(0).randint(0, 2048, (Tr, 16))
    e_icl, tr, _ = _build(tiny_models, tiny_cfg, input_ids=ids, ref_ids=ref_ids,
                          ref_codes=ref_codes, icl_mode=True, language="English")
    e0, _, _ = _build(tiny_models, tiny_cfg, input_ids=ids, language="English")
    # ICL replaces the single bos position with 1 + Tr positions
    assert e_icl.shape[1] == (e0.shape[1] - 1) + 1 + Tr
    # trailing = full_text(3 + 8) + eos minus consumed (1 + Tr)
    L = 3 + 8
    assert tr.shape[1] == L + 1 - (1 + Tr)


def test_icl_exhausted_text_trailing_is_pad(tiny_models, tiny_cfg, tok):
    ids = tok.build_assistant_ids("ab")
    ref_ids = tok.build_ref_ids("x")
    ref_codes = np.zeros((20, 16), np.int64)  # more frames than text
    _, tr, tpe = _build(tiny_models, tiny_cfg, input_ids=ids, ref_ids=ref_ids,
                        ref_codes=ref_codes, icl_mode=True, language="English")
    np.testing.assert_array_equal(np.asarray(tr), np.asarray(tpe))


def test_unknown_language_and_speaker_raise(tiny_models, tiny_cfg, tok):
    ids = tok.build_assistant_ids("a")
    with pytest.raises(PromptError, match="Language"):
        _build(tiny_models, tiny_cfg, input_ids=ids, language="Klingon")
    with pytest.raises(PromptError, match="Speaker"):
        _build(tiny_models, tiny_cfg, input_ids=ids, language="English",
               speaker="nobody")


def test_dialect_override_changes_prompt(tiny_models, tiny_cfg, tok):
    """Dialect speakers force their dialect language id under Chinese/Auto
    (reference model.py:387-393)."""
    ids = tok.build_assistant_ids("a")
    e_dialect, _, _ = _build(tiny_models, tiny_cfg, input_ids=ids,
                             language="Auto", speaker="eric")
    e_auto, _, _ = _build(tiny_models, tiny_cfg, input_ids=ids,
                          language="Auto", speaker="ryan")
    # eric (sichuan dialect) gets a 4-token think block; ryan (no dialect) gets 3
    assert e_dialect.shape[1] == e_auto.shape[1] + 1


def test_tokenizer_template_slices(tok):
    ids = tok.build_assistant_ids("hello")
    assert ids.shape[1] == 3 + 5 + 5
    rids = tok.build_ref_ids("hey")
    assert rids.shape[1] == 3 + 3 + 2
