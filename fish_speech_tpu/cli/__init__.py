"""CLI tools: llama_generate (text->tokens), encoder (wav->tokens),
vocoder (tokens->wav) — counterparts of fish_speech_core/src/bin/."""
