"""Generation drivers: jitted prefill + decode loops for the DualAR LM."""

from fish_speech_tpu.generate.engine import LMEngine, GenerationResult  # noqa: F401
