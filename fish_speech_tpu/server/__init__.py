"""OpenAI-compatible HTTP serving layer (aiohttp)."""

from fish_speech_tpu.server.app import create_app  # noqa: F401
