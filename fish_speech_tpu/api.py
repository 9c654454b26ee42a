"""User-facing Python API mirroring the reference's PyO3 bindings.

Counterpart of fish_speech_python (reference: fish_speech_python/src/
{lm.rs,codec.rs}): `LM` and `FireflyCodec` classes with the same
constructor and call signatures (device/dtype strings, same sampling
defaults). Device "cpu"/"cuda"/"metal" selectors map to JAX platforms;
on this stack "tpu" is the natural accelerator and anything that isn't
"cpu" simply uses the default JAX device.

    from fish_speech_tpu.api import LM, FireflyCodec
    lm = LM("checkpoints/fish-speech-1.5", version="1.5", dtype="bf16")
    codec = FireflyCodec("checkpoints/fish-speech-1.5", version="1.5")
    codes = lm(["Hello world."], speaker_prompt=prompt)   # (1, C, T)
    pcm = codec.decode(codes)                              # (1, 1, T*2048)
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from fish_speech_tpu.config import (
    DualARConfig,
    FireflyConfig,
    TokenConfig,
    WhichLM,
    WhichModel,
)
from fish_speech_tpu.generate.engine import LMEngine
from fish_speech_tpu.io.checkpoint import load_firefly_params, load_lm_params
from fish_speech_tpu.models.codec.firefly import FireflyCodec as _Codec
from fish_speech_tpu.ops.sampling import SamplingArgs
from fish_speech_tpu.text.prompt import PromptEncoder


def _dtype_of(dtype: str):
    if dtype == "bf16":
        return jnp.bfloat16
    if dtype == "f32":
        return jnp.float32
    raise ValueError(f"Unsupported dtype: {dtype}")


class LM:
    """(reference: fish_speech_python/src/lm.rs:24-145)."""

    def __init__(
        self,
        dir: str | Path,
        version: str = "1.5",
        device: str = "tpu",
        dtype: str = "bf16",
    ) -> None:
        del device  # JAX picks the platform; kept for signature parity
        dir = Path(dir)
        model = WhichModel(version)
        self.lm_type = WhichLM.from_model(model)

        from tokenizers import Tokenizer

        cfg_path = dir / "config.json"
        self.cfg = (
            DualARConfig.from_json(cfg_path)
            if cfg_path.exists()
            else DualARConfig.fish_speech_1_2()
        )
        self.tokenizer = Tokenizer.from_file(str(dir / "tokenizer.json"))
        token_cfg = TokenConfig.from_tokenizer(self.lm_type, self.tokenizer, self.cfg)
        params = load_lm_params(dir, self.cfg, dtype=_dtype_of(dtype))
        self.engine = LMEngine(
            params, self.cfg, token_cfg, self.lm_type, dtype=_dtype_of(dtype)
        )
        self.prompt_encoder = PromptEncoder(
            self.tokenizer, self.cfg.num_codebooks, self.lm_type
        )

    def __call__(
        self,
        input: List[str],
        sysprompt: Optional[str] = "Speak out the provided text",
        speaker_prompt: Optional[np.ndarray] = None,
        temp: float = 0.7,
        top_p: float = 0.9,
        top_k: int = 50,
        repetition_penalty: float = 1.2,
        max_new_tokens: int = 1024,
        seed: Optional[int] = None,
    ) -> np.ndarray:
        """input: pre-chunked text list. speaker_prompt: (1, C+1, T) uint32
        conditioning prompt from create_speaker_prompt. Returns codebook
        tokens uint32 (1, C, total_frames) — raw model output with no
        version shift, like the reference binding."""
        speaker = None
        if speaker_prompt is not None:
            speaker = np.asarray(speaker_prompt)
            if speaker.ndim == 3:
                speaker = speaker[0]

        n_cond, prompts = self.prompt_encoder.encode_sequence(
            list(input), sysprompt, speaker, assume_kv_cache=True
        )
        sampling = SamplingArgs(
            temp=temp,
            top_p=top_p,
            top_k=top_k,
            repetition_penalty=repetition_penalty,
        )

        state = self.engine.init_state(seed)
        outputs = []
        cond_len = 0
        for i, prompt in enumerate(prompts):
            offset = cond_len if i > 0 else 0
            result, state = self.engine.generate(
                prompt,
                max_new_tokens=max_new_tokens,
                sampling=sampling,
                state=state,
                conditioning_offset=offset,
            )
            if i == 0:
                cond_len = n_cond
            state = self.engine.rewind(state, cond_len)
            outputs.append(result.tokens)
        return np.concatenate(outputs, axis=1)[None].astype(np.uint32)

    def create_speaker_prompt(
        self, input: List[Dict[str, np.ndarray]]
    ) -> np.ndarray:
        """input: [{"text": str, "codes": uint32 (1, C, T)}]. Returns the
        concatenated conditioning prompt (1, C+1, total)
        (reference: lm.rs:147-199)."""
        if not input:
            raise ValueError("input is empty")
        prompts = []
        for sample in input:
            codes = np.asarray(sample["codes"])
            if codes.ndim == 3:
                codes = codes[0]
            prompts.append(
                self.prompt_encoder.encode_conditioning_prompt(
                    sample["text"], codes
                )
            )
        return np.concatenate(prompts, axis=1)[None].astype(np.uint32)


class FireflyCodec:
    """(reference: fish_speech_python/src/codec.rs:18-115)."""

    def __init__(
        self,
        dir: str | Path,
        version: str = "1.5",
        device: str = "tpu",
        dtype: str = "f32",
    ) -> None:
        del device
        fish_version = WhichModel(version).fish_version
        if fish_version is None:
            raise ValueError(f"No Firefly codec for version {version}")
        cfg = FireflyConfig.for_version(fish_version)
        params = load_firefly_params(dir, cfg, dtype=_dtype_of(dtype))
        self._codec = _Codec(params, cfg)

    @property
    def sample_rate(self) -> int:
        return self._codec.sample_rate

    def encode(self, audio: np.ndarray) -> np.ndarray:
        """f32 (B, 1, T) or (B, T) PCM -> uint32 (B, C, T') codes."""
        audio = np.asarray(audio, np.float32)
        if audio.ndim == 3:
            audio = audio.mean(axis=1)
        return self._codec.encode(audio).astype(np.uint32)

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """uint32 (B, C, T) codes -> f32 (B, 1, T*upsample) PCM."""
        codes = np.asarray(codes, np.int64).astype(np.int32)
        if codes.ndim == 2:
            codes = codes[None]
        out = self._codec.decode(codes)
        return out[:, None, :]
