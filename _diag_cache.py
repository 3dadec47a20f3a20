import time, logging, sys
logging.basicConfig(level=logging.INFO)
import jax
jax.config.update("jax_log_compiles", True)
import numpy as np
from qwen3tts_tpu import FasterQwen3TTS
from qwen3tts_tpu.audio.wav import write_wav
sr=24000
t=np.linspace(0,3.0,3*sr,dtype=np.float32)
write_wav("/tmp/bench_ref.wav",(0.25*np.sin(2*np.pi*180*t)).astype(np.float32),sr)
text="The quick brown fox jumps over the lazy dog while the tired developer benchmarks text to speech engines."
m = FasterQwen3TTS.from_pretrained("random:qwen3-tts-0.6b", dtype="bfloat16")
t0=time.time()
m.generate_voice_clone(text,"English","/tmp/bench_ref.wav","reference transcript",max_new_tokens=16,min_new_tokens=16)
print(f"WARMUP GEN: {time.time()-t0:.1f}s", flush=True)
t0=time.time()
list(m.generate_voice_clone_streaming(text,"English","/tmp/bench_ref.wav","reference transcript",max_new_tokens=16,min_new_tokens=16,chunk_size=8))
print(f"STREAM WARM: {time.time()-t0:.1f}s", flush=True)
