"""Continuous-batching scheduler tests (runtime/scheduler.py): requests are
served through one batched engine, join mid-batch, and stream independently."""
import threading
import time

import numpy as np
import pytest

from qwen3tts_tpu.runtime.engine import GenerationPolicy
from qwen3tts_tpu.runtime.scheduler import ContinuousBatcher

# deterministic: greedy, EOS suppressed past the step budget so every row
# runs to its own max_new_tokens
NO_EOS = GenerationPolicy(do_sample=False, min_new_tokens=10_000)


@pytest.fixture()
def batcher(tiny_tts):
    b = ContinuousBatcher(tiny_tts, max_batch=2, chunk_size=8,
                          max_new_tokens=40, policy=NO_EOS)
    yield b
    b.close()


def _collect(handle):
    chunks = [a for a, _, _ in handle.chunks()]
    return np.concatenate(chunks) if chunks else np.zeros(0, np.float32)


def test_two_requests_batch_and_third_joins(batcher, tiny_tts, ref_wav):
    spf = tiny_tts.vocoder.spf
    h1 = batcher.submit("First utterance.", "English", ref_wav, "ref")
    h2 = batcher.submit("A different second text.", "English", ref_wav, "ref")
    results = {}

    def drain(name, h):
        results[name] = _collect(h)

    t1 = threading.Thread(target=drain, args=("a", h1))
    t2 = threading.Thread(target=drain, args=("b", h2))
    t1.start(); t2.start()
    # let the batch get rolling, then submit a third — it must join the
    # RUNNING batch (both rows busy until their budget, so the join path
    # is the only way it gets served before the batch ends)
    time.sleep(0.5)
    h3 = batcher.submit("Late third arrival.", "English", ref_wav, "ref")
    results["c"] = _collect(h3)
    t1.join(timeout=600); t2.join(timeout=600)

    for name in ("a", "b", "c"):
        wav = results[name]
        assert len(wav) == 40 * spf, f"row {name}: {len(wav)} samples"
        assert np.isfinite(wav).all()
    assert batcher.stats["served"] == 3
    assert batcher.stats["joined_mid_batch"] >= 1, (
        "third request was not admitted into the running batch")


def test_more_requests_than_rows_all_served(batcher, tiny_tts, ref_wav):
    spf = tiny_tts.vocoder.spf
    handles = [
        batcher.submit(f"Utterance number {i}.", "English", ref_wav, "ref",
                       max_new_tokens=16)
        for i in range(5)
    ]
    outs = []
    threads = []
    lock = threading.Lock()

    def drain(h):
        w = _collect(h)
        with lock:
            outs.append(w)

    for h in handles:
        t = threading.Thread(target=drain, args=(h,))
        t.start()
        threads.append(t)
    for t in threads:
        t.join(timeout=600)
    assert len(outs) == 5
    for wav in outs:
        assert len(wav) == 16 * spf
    assert batcher.stats["served"] == 5


def test_cancel_stops_stream_early(batcher, ref_wav):
    h = batcher.submit("A long cancelled utterance.", "English", ref_wav, "ref")
    got = []
    for audio, _, _ in h.chunks():
        got.append(audio)
        h.cancel()
    total = sum(len(a) for a in got)
    assert 0 < total < 40 * batcher.model.vocoder.spf


def test_timing_contract(batcher, ref_wav):
    h = batcher.submit("Check the timing dict.", "English", ref_wav, "ref",
                       max_new_tokens=16)
    timings = [t for _, _, t in h.chunks()]
    assert timings, "no chunks emitted"
    assert "ttfa_ms" in timings[0] and timings[0]["ttfa_ms"] > 0
    assert timings[0]["chunk_index"] == 0
    assert timings[-1]["total_steps_so_far"] == 16
    for t in timings:
        assert t["chunk_steps"] > 0 and "queue_ms" in t
