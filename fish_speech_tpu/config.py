"""Version registry and model/codec configuration.

TPU-native equivalent of the reference's version-dispatch enums and config
structs (reference: fish_speech_core/lib/config.rs:4-57,
fish_speech_core/lib/lm/dual_ar.rs:56-116, fish_speech_core/lib/codec/config.rs).

Everything here is a plain frozen dataclass so configs hash and can be used
as static arguments to jitted functions.
"""

from __future__ import annotations

import dataclasses
import enum
import json
from pathlib import Path
from typing import Optional, Tuple


class FishVersion(enum.Enum):
    """Fish Speech checkpoint generation (reference: config.rs:4-8)."""

    V1_2 = "1.2"
    V1_4 = "1.4"
    V1_5 = "1.5"


class WhichModel(enum.Enum):
    """User-facing model selector (reference: config.rs:10-23)."""

    FISH_1_2 = "1.2"
    FISH_1_4 = "1.4"
    FISH_1_5 = "1.5"
    DUAL_AR = "dual_ar"

    @property
    def fish_version(self) -> Optional[FishVersion]:
        return {
            WhichModel.FISH_1_2: FishVersion.V1_2,
            WhichModel.FISH_1_4: FishVersion.V1_4,
            WhichModel.FISH_1_5: FishVersion.V1_5,
        }.get(self)


class WhichLM(enum.Enum):
    """LM family: Fish (per-version quirks) or generic DualAR
    (reference: config.rs:42-57)."""

    FISH_1_2 = "fish_1.2"
    FISH_1_4 = "fish_1.4"
    FISH_1_5 = "fish_1.5"
    DUAL_AR = "dual_ar"

    @staticmethod
    def from_model(model: WhichModel) -> "WhichLM":
        return {
            WhichModel.FISH_1_2: WhichLM.FISH_1_2,
            WhichModel.FISH_1_4: WhichLM.FISH_1_4,
            WhichModel.FISH_1_5: WhichLM.FISH_1_5,
            WhichModel.DUAL_AR: WhichLM.DUAL_AR,
        }[model]

    @property
    def fish_version(self) -> Optional[FishVersion]:
        return {
            WhichLM.FISH_1_2: FishVersion.V1_2,
            WhichLM.FISH_1_4: FishVersion.V1_4,
            WhichLM.FISH_1_5: FishVersion.V1_5,
        }.get(self)

    @property
    def uses_explicit_semantic_ids(self) -> bool:
        """1.5/DualAR encode semantic codes as distinct `<|semantic:N|>` vocab
        tokens; 1.2/1.4 use a single `<|semantic|>` pad token and the slow
        head only chooses PAD vs `<|im_end|>`
        (reference: dual_ar.rs:34-45, single_batch.rs:103-140)."""
        return self in (WhichLM.FISH_1_5, WhichLM.DUAL_AR)


class WhichCodec(enum.Enum):
    """Audio codec selector (reference: config.rs:25-40)."""

    FIREFLY_1_2 = "firefly_1.2"
    FIREFLY_1_4 = "firefly_1.4"
    FIREFLY_1_5 = "firefly_1.5"
    MIMI = "mimi"

    @staticmethod
    def from_model(model: WhichModel) -> "WhichCodec":
        return {
            WhichModel.FISH_1_2: WhichCodec.FIREFLY_1_2,
            WhichModel.FISH_1_4: WhichCodec.FIREFLY_1_4,
            WhichModel.FISH_1_5: WhichCodec.FIREFLY_1_5,
            WhichModel.DUAL_AR: WhichCodec.MIMI,
        }[model]


# --------------------------------------------------------------------------
# DualAR language model config
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DualARConfig:
    """Architecture hyperparameters for the DualAR transformer.

    Field-compatible with the reference's `BaseModelArgs`
    (reference: dual_ar.rs:56-116) and the checkpoint `config.json`.
    """

    vocab_size: int
    n_layer: int
    n_fast_layer: int
    n_head: int
    dim: int
    intermediate_size: Optional[int]
    n_local_heads: int
    head_dim: int
    rope_base: float
    norm_eps: float
    max_seq_len: int
    codebook_size: int
    num_codebooks: int
    tie_word_embeddings: bool = False
    attention_qkv_bias: bool = False
    depthwise_wte: bool = False
    depthwise_output: bool = False
    # Unused at inference; kept for config.json compatibility.
    dropout: float = 0.0
    initializer_range: float = 0.02
    model_type: str = "base"
    use_gradient_checkpointing: bool = False

    @property
    def ffn_dim(self) -> int:
        return self.intermediate_size if self.intermediate_size else self.dim * 4

    @property
    def fast_vocab_size(self) -> int:
        """Rows of fast_embeddings (reference: dual_ar.rs:491-494)."""
        if self.depthwise_wte:
            return (self.num_codebooks - 1) * self.codebook_size
        return self.codebook_size

    @property
    def fast_output_size(self) -> int:
        """Rows of fast_output (reference: dual_ar.rs:504-507)."""
        if self.depthwise_output:
            return self.codebook_size * self.num_codebooks
        return self.codebook_size

    @staticmethod
    def fish_speech_1_2() -> "DualARConfig":
        """Hardcoded Fish 1.2 SFT architecture (reference: dual_ar.rs:84-108)."""
        return DualARConfig(
            vocab_size=32000,
            n_layer=24,
            n_fast_layer=4,
            n_head=16,
            dim=1024,
            intermediate_size=4096,
            n_local_heads=2,
            head_dim=64,
            rope_base=1_000_000.0,
            norm_eps=1e-6,
            max_seq_len=4096,
            codebook_size=1024,
            num_codebooks=4,
        )

    @staticmethod
    def fish_speech_1_5() -> "DualARConfig":
        """Fish 1.5 architecture (same backbone as 1.2 with 8 codebooks and
        the ~100k vocab carrying `<|semantic:N|>` tokens; real runs load
        the checkpoint's config.json — this is for benchmarks/tests)."""
        return dataclasses.replace(
            DualARConfig.fish_speech_1_2(),
            vocab_size=102048,
            num_codebooks=8,
        )

    @staticmethod
    def from_json(path: str | Path) -> "DualARConfig":
        with open(path) as f:
            raw = json.load(f)
        fields = {f.name for f in dataclasses.fields(DualARConfig)}
        kwargs = {k: v for k, v in raw.items() if k in fields}
        for flag in ("depthwise_wte", "depthwise_output"):
            if kwargs.get(flag) is None:
                kwargs[flag] = False
        return DualARConfig(**kwargs)


@dataclasses.dataclass(frozen=True)
class TokenConfig:
    """Resolved special-token ids (reference: dual_ar.rs:17-54)."""

    im_end_id: int
    pad_id: int
    semantic_start_id: int
    semantic_end_id: Optional[int]

    @staticmethod
    def from_tokenizer(lm: WhichLM, tokenizer, config: DualARConfig) -> "TokenConfig":
        """`tokenizer` is a `tokenizers.Tokenizer`."""
        im_end_id = tokenizer.token_to_id("<|im_end|>")
        if im_end_id is None:
            raise ValueError("Tokenizer does not have <|im_end|>")
        if lm.uses_explicit_semantic_ids:
            semantic_start_id = tokenizer.token_to_id("<|semantic:0|>")
            if semantic_start_id is None:
                semantic_start_id = 100012
            semantic_end_id = tokenizer.token_to_id(
                f"<|semantic:{config.codebook_size - 1}|>"
            )
        else:
            semantic_start_id = tokenizer.token_to_id("<|semantic|>")
            if semantic_start_id is None:
                semantic_start_id = 5
            semantic_end_id = None
        pad_id = tokenizer.token_to_id("<|semantic|>")
        if pad_id is None:
            pad_id = 5
        return TokenConfig(
            im_end_id=im_end_id,
            pad_id=pad_id,
            semantic_start_id=semantic_start_id,
            semantic_end_id=semantic_end_id,
        )


# --------------------------------------------------------------------------
# Firefly codec config
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SpecTransformConfig:
    """(reference: codec/config.rs:4-42)"""

    sample_rate: int = 44100
    n_mels: int = 160
    n_fft: int = 2048
    hop_length: int = 512
    win_length: int = 2048


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    """ConvNeXt encoder (reference: codec/config.rs:44-82)"""

    input_channels: int = 160
    depths: Tuple[int, ...] = (3, 3, 9, 3)
    dims: Tuple[int, ...] = (128, 256, 384, 512)
    kernel_size: int = 7


@dataclasses.dataclass(frozen=True)
class HiFiGANConfig:
    """(reference: codec/config.rs:84-130)"""

    hop_length: int = 512
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5),
        (1, 3, 5),
        (1, 3, 5),
    )
    num_mels: int = 512
    upsample_initial_channel: int = 512
    pre_conv_kernel_size: int = 13
    post_conv_kernel_size: int = 13


@dataclasses.dataclass(frozen=True)
class DownsampleFSQConfig:
    """(reference: codec/config.rs:134-168)"""

    input_dim: int = 512
    n_codebooks: int = 1  # residual quantizers per group
    n_groups: int = 8
    levels: Tuple[int, ...] = (8, 5, 5, 5)
    downsample_factor: Tuple[int, ...] = (2, 2)
    downsample_dims: Optional[Tuple[int, ...]] = None

    @property
    def all_dims(self) -> Tuple[int, ...]:
        if self.downsample_dims is not None:
            return (self.input_dim,) + tuple(self.downsample_dims)
        return (self.input_dim,) * (len(self.downsample_factor) + 1)

    @property
    def total_downsample(self) -> int:
        out = 1
        for f in self.downsample_factor:
            out *= f
        return out

    @property
    def num_semantic_codebooks(self) -> int:
        """Codebook rows produced by encode(): groups * quantizers
        (reference: quantizer.rs:104-124)."""
        return self.n_groups * self.n_codebooks

    @staticmethod
    def firefly_1_2() -> "DownsampleFSQConfig":
        return DownsampleFSQConfig(
            n_groups=4, downsample_factor=(2,), levels=(8, 5, 5, 5)
        )

    @staticmethod
    def firefly_1_4() -> "DownsampleFSQConfig":
        return DownsampleFSQConfig(
            n_groups=8, downsample_factor=(2, 2), levels=(8, 5, 5, 5)
        )


@dataclasses.dataclass(frozen=True)
class FireflyConfig:
    """(reference: codec/config.rs:170-203)"""

    spec_transform: SpecTransformConfig = SpecTransformConfig()
    backbone: BackboneConfig = BackboneConfig()
    head: HiFiGANConfig = HiFiGANConfig()
    quantizer: DownsampleFSQConfig = DownsampleFSQConfig()
    version: FishVersion = FishVersion.V1_5

    @staticmethod
    def for_version(version: FishVersion) -> "FireflyConfig":
        if version == FishVersion.V1_2:
            return FireflyConfig(
                quantizer=DownsampleFSQConfig.firefly_1_2(), version=version
            )
        return FireflyConfig(
            quantizer=DownsampleFSQConfig.firefly_1_4(), version=version
        )

    @property
    def frame_rate(self) -> float:
        """Semantic tokens per second of audio
        (reference: single_batch.rs:292-295, bin/encoder.rs:94)."""
        return self.spec_transform.sample_rate / (
            self.spec_transform.hop_length * self.quantizer.total_downsample
        )

    @property
    def samples_per_frame(self) -> int:
        return self.spec_transform.hop_length * self.quantizer.total_downsample


# Default sampling parameters (reference: server/lib/utils/load.rs:41-47,116-125)
DEFAULT_TEMP = 0.7
DEFAULT_TOP_P = 0.8
DEFAULT_TOP_K = 256
DEFAULT_MAX_NEW_TOKENS = 1792


def default_rep_pen(lm: WhichLM) -> float:
    """1.4 for Fish 1.5, 1.2 for earlier (reference: load.rs:116-125)."""
    return 1.4 if lm == WhichLM.FISH_1_5 else 1.2
