#!/usr/bin/env python3
"""One-time x-vector extraction → .npz (reference examples/extract_speaker.py:
2048-dim speaker embedding, ~4 KB artifact, reusable without the ref audio)."""
import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser(description="Extract a speaker x-vector")
    p.add_argument("ref_audio", help="reference WAV")
    p.add_argument("-o", "--output", default="speaker.npz")
    p.add_argument("--model", default="random:qwen3-tts-0.6b")
    p.add_argument("--dtype", default="bf16")
    args = p.parse_args()

    from qwen3tts_tpu import FasterQwen3TTS

    model = FasterQwen3TTS.from_pretrained(args.model, dtype=args.dtype)
    emb = model.extract_speaker_embedding(args.ref_audio)
    np.savez(args.output, ref_spk_embedding=emb)
    print(f"saved {emb.shape} x-vector ({emb.nbytes} bytes) -> {args.output}")


if __name__ == "__main__":
    main()
