"""wav -> codec tokens .npy (voice cloning / speaker prompts).

Counterpart of reference: fish_speech_core/src/bin/encoder.rs.

Usage:
  python -m fish_speech_tpu.cli.encoder --input ref.wav --checkpoint \
      checkpoints/fish-speech-1.5 --fish-version 1.5 --out-path codes.npy
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from fish_speech_tpu.audio.resample import resample
from fish_speech_tpu.audio.wav import read_wav
from fish_speech_tpu.config import FireflyConfig, WhichModel
from fish_speech_tpu.io.checkpoint import load_firefly_params
from fish_speech_tpu.models.codec.firefly import FireflyCodec


def main() -> None:
    p = argparse.ArgumentParser(description="wav -> codec tokens (.npy)")
    p.add_argument("--input", "-i", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument(
        "--fish-version", default="1.5", choices=["1.2", "1.4", "1.5"]
    )
    p.add_argument("--out-path", "-o", default="codes.npy")
    args = p.parse_args()

    version = WhichModel(args.fish_version).fish_version
    cfg = FireflyConfig.for_version(version)
    t0 = time.perf_counter()
    params = load_firefly_params(args.checkpoint, cfg)
    codec = FireflyCodec(params, cfg)
    print(f"Codec loaded in {time.perf_counter() - t0:.1f}s")

    audio, sr = read_wav(args.input)
    audio = resample(audio, sr, codec.sample_rate)
    duration = audio.shape[-1] / codec.sample_rate

    t0 = time.perf_counter()
    codes = codec.encode(audio)[0]
    dt = time.perf_counter() - t0
    print(
        f"Encoded {duration:.2f}s of audio to {codes.shape} tokens in "
        f"{dt:.2f}s (RTF {duration / dt:.1f}x, frame rate "
        f"{cfg.frame_rate:.3f} Hz)"
    )
    np.save(args.out_path, codes.astype(np.uint32))
    print(f"Wrote {args.out_path}")


if __name__ == "__main__":
    main()
