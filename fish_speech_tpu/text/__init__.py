"""Text frontend: cleaning/chunking and ChatML prompt encoding."""

from fish_speech_tpu.text.clean import preprocess_text  # noqa: F401
from fish_speech_tpu.text.prompt import PromptEncoder, load_prompt_tokens  # noqa: F401
