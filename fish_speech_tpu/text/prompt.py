"""ChatML prompt assembly with codec-token conditioning.

Behavioral port of reference: fish_speech_core/lib/text/prompt.rs.
All outputs are (num_codebooks + 1, N) int32 numpy arrays: row 0 is the
text/semantic vocab row, rows 1.. are codebook rows (zero under pure
text). Version quirks reproduced exactly:

* Fish 1.5 / DualAR: semantic row carries `<|semantic:code>` vocab ids
  (semantic_start + code); assistant prefix gains `<|voice|>` for 1.5
  (prompt.rs:55-93).
* Fish <=1.4: semantic row is all `<|semantic|>` (pad) and codebook
  tokens are stored +1 (prompt.rs:79-91); generation output is later
  shifted -1 (reference: server speech.rs:63-68).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from fish_speech_tpu.config import WhichLM


class PromptEncoder:
    def __init__(self, tokenizer, num_codebooks: int, lm: WhichLM) -> None:
        self.tokenizer = tokenizer
        self.num_codebooks = num_codebooks
        self.lm = lm

    def _tokenize_text(self, text: str) -> np.ndarray:
        ids = self.tokenizer.encode(text, add_special_tokens=False).ids
        out = np.zeros((self.num_codebooks + 1, len(ids)), np.int32)
        out[0] = ids
        return out

    def encode_text(self, role: str, content: Optional[str] = None) -> np.ndarray:
        if content is not None:
            s = f"<|im_start|>{role}\n{content}<|im_end|>"
        else:
            s = f"<|im_start|>{role}\n"
        return self._tokenize_text(s)

    def encode_vq(self, prompt_tokens: Optional[np.ndarray] = None) -> np.ndarray:
        """Assistant turn wrapping codec tokens (prompt.rs:53-93).
        prompt_tokens: (num_codebooks, T) codec codes."""
        voice = "<|voice|>" if self.lm == WhichLM.FISH_1_5 else ""
        prefix = self._tokenize_text(f"<|im_start|>assistant\n{voice}")
        if prompt_tokens is None:
            return prefix
        suffix = self._tokenize_text("<|im_end|>")

        prompt_tokens = np.asarray(prompt_tokens, dtype=np.int32)
        if prompt_tokens.shape[0] != self.num_codebooks:
            raise ValueError(
                f"Expected {self.num_codebooks} codebooks, got {prompt_tokens.shape[0]}"
            )
        seqlen = prompt_tokens.shape[1]

        if self.lm.uses_explicit_semantic_ids:
            semantic_start = self.tokenizer.token_to_id("<|semantic:0|>")
            semantic_row = semantic_start + prompt_tokens[0]
            codebook_rows = prompt_tokens
        else:
            semantic_id = self.tokenizer.token_to_id("<|semantic|>")
            if semantic_id is None:
                semantic_id = 5
            semantic_row = np.full((seqlen,), semantic_id, np.int32)
            codebook_rows = prompt_tokens + 1  # the +1 quirk (prompt.rs:88)

        vq_span = np.concatenate([semantic_row[None], codebook_rows], axis=0)
        return np.concatenate([prefix, vq_span, suffix], axis=1)

    def encode_conditioning_prompt(
        self, prompt_text: str, prompt_tokens: np.ndarray
    ) -> np.ndarray:
        """user turn + assistant VQ turn (prompt.rs:96-104)."""
        return np.concatenate(
            [self.encode_text("user", prompt_text), self.encode_vq(prompt_tokens)],
            axis=1,
        )

    def encode_sequence(
        self,
        chunks: List[str],
        sysprompt_text: Optional[str] = None,
        cached_speaker: Optional[np.ndarray] = None,
        assume_kv_cache: bool = False,
    ) -> Tuple[int, List[np.ndarray]]:
        """Returns (num_conditioning_tokens, per-chunk encoded prompts)
        (prompt.rs:107-156). With assume_kv_cache, conditioning tokens
        (sysprompt + speaker) only prefix the FIRST chunk; later chunks
        rely on the retained KV-cache prefix."""
        if not chunks:
            raise ValueError("Input text cannot be empty")

        sysprompt = (
            self.encode_text("system", sysprompt_text)
            if sysprompt_text is not None
            else None
        )
        parts = [p for p in (sysprompt, cached_speaker) if p is not None]
        conditioning = (
            np.concatenate(parts, axis=1).astype(np.int32) if parts else None
        )
        n_conditioning = conditioning.shape[1] if conditioning is not None else 0

        assistant_start = self.encode_vq(None)
        encoded = []
        for i, chunk in enumerate(chunks):
            prompt_parts = []
            if conditioning is not None and (i == 0 or not assume_kv_cache):
                prompt_parts.append(conditioning)
            prompt_parts.append(self.encode_text("user", chunk))
            prompt_parts.append(assistant_start)
            encoded.append(np.concatenate(prompt_parts, axis=1))
        return n_conditioning, encoded


def load_prompt_tokens(path: str | Path, num_codebooks: int) -> np.ndarray:
    """Load speaker-conditioning codec tokens from .npy with shape
    validation (reference: prompt.rs:159-198)."""
    arr = np.load(path)
    if arr.ndim == 3 and arr.shape[0] == 1:
        arr = arr[0]
    if arr.ndim != 2:
        raise ValueError(f"Incorrect prompt token dimensions for {path}: {arr.ndim}")
    if arr.shape[0] != num_codebooks:
        raise ValueError(
            f"Expected {num_codebooks} codebooks but got {arr.shape[0]}"
        )
    return arr.astype(np.int32)
