"""codec tokens .npy -> wav.

Counterpart of reference: fish_speech_core/src/bin/vocoder.rs.

Usage:
  python -m fish_speech_tpu.cli.vocoder --input codes.npy --checkpoint \
      checkpoints/fish-speech-1.5 --fish-version 1.5 --out-path out.wav
"""

from __future__ import annotations

import argparse
import time

import jax.numpy as jnp
import numpy as np

from fish_speech_tpu.audio.wav import write_pcm_as_wav
from fish_speech_tpu.config import FireflyConfig, WhichModel
from fish_speech_tpu.io.checkpoint import load_firefly_params
from fish_speech_tpu.models.codec.firefly import FireflyCodec


def main() -> None:
    p = argparse.ArgumentParser(description="codec tokens (.npy) -> wav")
    p.add_argument("--input", "-i", default="out.npy")
    p.add_argument("--checkpoint", required=True)
    p.add_argument(
        "--fish-version", default="1.5", choices=["1.2", "1.4", "1.5"]
    )
    p.add_argument("--out-path", "-o", default="fish_speech.wav")
    p.add_argument(
        "--bf16", action="store_true",
        help="run the vocoder in bfloat16 (vocoder.rs:44-48)",
    )
    args = p.parse_args()

    version = WhichModel(args.fish_version).fish_version
    cfg = FireflyConfig.for_version(version)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    t0 = time.perf_counter()
    params = load_firefly_params(args.checkpoint, cfg, dtype=dtype)
    codec = FireflyCodec(params, cfg)
    print(f"Codec loaded in {time.perf_counter() - t0:.1f}s")

    codes = np.load(args.input)
    if codes.ndim == 3:
        codes = codes[0]
    t0 = time.perf_counter()
    audio = codec.decode(codes.astype(np.int32))[0]
    dt = time.perf_counter() - t0
    duration = audio.shape[-1] / codec.sample_rate
    print(
        f"Decoded {codes.shape} tokens to {duration:.2f}s of audio in "
        f"{dt:.2f}s (RTF {duration / dt:.1f}x)"
    )
    with open(args.out_path, "wb") as f:
        write_pcm_as_wav(f, np.asarray(audio, np.float32), codec.sample_rate)
    print(f"Wrote {args.out_path}")


if __name__ == "__main__":
    main()
