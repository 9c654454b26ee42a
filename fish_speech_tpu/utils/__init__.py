"""Small shared utilities (timing, numerics helpers)."""

from fish_speech_tpu.utils.timing import Timer  # noqa: F401
