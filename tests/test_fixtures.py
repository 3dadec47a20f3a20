"""Golden-fixture parity harness (reference test layer 1 machinery,
test_e2e_parity.py:411-580).  Fixtures are self-hosted from this framework's
parity path until real upstream weights exist; the tests prove the
export→import→compare loop and that the checker's two failure modes (prompt
drift vs decode drift) are correctly distinguished."""
import json

import numpy as np
import pytest

from qwen3tts_tpu.core import fixtures as F


@pytest.fixture(scope="module")
def fixture_file(tiny_tts, tmp_path_factory):
    path = tmp_path_factory.mktemp("golden") / "plain_english.npz"
    meta = F.export_model_fixture(
        tiny_tts, path, text="parity check", max_new_tokens=10)
    return path, meta


def test_export_and_reload(fixture_file):
    path, meta = fixture_file
    tokens, meta2, _ = F.load_fixture(path)
    assert tokens.ndim == 2 and tokens.shape[1] == 16
    assert meta2["text"] == "parity check" and meta2["greedy"]
    assert len(meta2["prefill_sha256"]) == 64


def test_check_passes_on_same_model(tiny_tts, fixture_file):
    path, _ = fixture_file
    F.check_model_fixture(tiny_tts, path)  # no raise == parity


def test_check_detects_decode_drift(tiny_tts, fixture_file, tmp_path):
    """Corrupt one golden token → checker must flag DECODE drift."""
    path, _ = fixture_file
    tokens, meta, _ = F.load_fixture(path)
    bad = tokens.copy()
    bad[1, 0] = (bad[1, 0] + 1) % 100
    bad_path = tmp_path / "bad_tokens.npz"
    np.savez(bad_path, tokens=bad,
             meta=np.frombuffer(json.dumps(meta).encode(), np.uint8))
    with pytest.raises(AssertionError, match="DECODE drift"):
        F.check_model_fixture(tiny_tts, bad_path)


def test_check_detects_prompt_drift(tiny_tts, fixture_file, tmp_path):
    """Corrupt the prefill checksum → checker must flag PROMPT ASSEMBLY
    drift (before even decoding)."""
    path, _ = fixture_file
    tokens, meta, _ = F.load_fixture(path)
    meta["prefill_sha256"] = "0" * 64
    bad_path = tmp_path / "bad_sha.npz"
    np.savez(bad_path, tokens=tokens,
             meta=np.frombuffer(json.dumps(meta).encode(), np.uint8))
    with pytest.raises(AssertionError, match="PROMPT ASSEMBLY drift"):
        F.check_model_fixture(tiny_tts, bad_path)
