"""fish_speech_tpu — a TPU-native (JAX/XLA/Pallas) text-to-speech inference framework.

A ground-up rebuild of the capabilities of EndlessReform/fish-speech.rs
(reference: /root/reference, analysed in SURVEY.md) designed for TPU hardware:

* DualAR text-to-semantic LM (slow GQA backbone + fast per-codebook
  transformer) as a statically-shaped, jitted, on-device decode loop with
  pre-allocated KV caches and device-side constrained sampling
  (no host round-trip per token).
* FireflyGAN-VQ codec (ConvNeXt encoder, grouped-residual-FSQ quantizer,
  HiFiGAN generator) lowered to fused XLA convolutions.
* OpenAI-compatible serving surface (/v1/audio/speech, /v1/audio/encoding,
  /v1/voices) with streaming Ogg/Opus via a native C++ extension.
* Scale-out via jax.sharding.Mesh + NamedSharding (tensor-parallel matmuls,
  data-parallel batched decode) — see fish_speech_tpu.parallel.

Supported checkpoints: Fish Speech 1.2 SFT, 1.4, 1.5 and generic DualAR
(smoltts) safetensors, mirroring the reference's version registry
(reference: fish_speech_core/lib/config.rs).
"""

__version__ = "0.1.0"

from fish_speech_tpu.config import (  # noqa: F401
    DualARConfig,
    FireflyConfig,
    FishVersion,
    WhichCodec,
    WhichLM,
    WhichModel,
)
