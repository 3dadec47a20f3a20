#!/usr/bin/env python3
"""Synthesize from a saved x-vector without reference audio (reference
examples/generate_with_embedding.py): shows direct use of the prompt builder
and decode loops below the FasterQwen3TTS surface."""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("embedding", help=".npz from extract_speaker.py")
    p.add_argument("--text", default="Hello from a saved speaker embedding.")
    p.add_argument("--language", default="English")
    p.add_argument("--model", default="random:qwen3-tts-0.6b")
    p.add_argument("--dtype", default="bf16")
    p.add_argument("-o", "--output", default="out.wav")
    p.add_argument("--max-new-tokens", type=int, default=360)
    args = p.parse_args()

    from qwen3tts_tpu import FasterQwen3TTS
    from qwen3tts_tpu.audio.wav import write_wav
    from qwen3tts_tpu.runtime import loops

    model = FasterQwen3TTS.from_pretrained(args.model, dtype=args.dtype)
    xvec = np.load(args.embedding)["ref_spk_embedding"]

    input_ids = model.tokenizer.build_assistant_ids(args.text)
    spk = model.prompt_builder.project_speaker(xvec)
    embeds, trailing, tpe = model._to_device(*model.prompt_builder.build(
        input_ids=input_ids, spk_embedding=spk, language=args.language,
        non_streaming_mode=True,
    ))

    pol, ppol = model._policies(0.9, 50, 1.0, True, 1.05, 2)
    model._warmup(embeds.shape[1], trailing.shape[1], pol, ppol)
    t0 = time.time()
    ids, timing = loops.fast_generate(
        model.engine, embeds, trailing, tpe, key=jax.random.PRNGKey(0),
        max_new_tokens=args.max_new_tokens, policy=pol, pred_policy=ppol)
    wav = model.vocoder.decode(ids)
    wall = time.time() - t0
    write_wav(args.output, wav, model.sample_rate)
    print(f"wrote {args.output}: {len(wav)/model.sample_rate:.2f}s in {wall:.2f}s "
          f"({timing['ms_per_step']:.1f} ms/step)")


if __name__ == "__main__":
    main()
