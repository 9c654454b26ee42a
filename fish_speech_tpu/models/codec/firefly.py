"""FireflyGAN-VQ codec facade: audio -> codes (encode) and
codes -> 44.1 kHz PCM (decode).

Counterpart of reference: fish_speech_core/lib/codec/{firefly,decoder,
encoder}.rs. Both directions are jitted whole-graph XLA programs; the
token axis is padded to buckets so arbitrary lengths reuse compilations,
with sequence masks zeroing the padded tail exactly like the reference's
`sequence_mask` (decoder.rs:9-14,37-68).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fish_speech_tpu.audio.mel import LogMelSpectrogram, num_frames
from fish_speech_tpu.config import FireflyConfig, FishVersion
from fish_speech_tpu.models.codec.convnext import convnext_encoder, init_convnext_encoder
from fish_speech_tpu.models.codec.hifigan import hifigan_forward, init_hifigan_params
from fish_speech_tpu.models.codec.stream_conv import StreamSessionBase
from fish_speech_tpu.models.codec.quantizer import (
    init_quantizer_params,
    quantizer_decode,
    quantizer_encode,
)

DECODE_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048)


def firefly_decode(
    params: Dict,
    cfg: FireflyConfig,
    indices: jnp.ndarray,
    feature_lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(B, num_codebooks, T) int codes -> (B, 1, T * ds * hop) PCM
    (reference: decoder.rs:37-68)."""
    b, _, t = indices.shape
    factor = cfg.quantizer.total_downsample
    if feature_lengths is None:
        feature_lengths = jnp.full((b,), t, jnp.int32)

    z = quantizer_decode(indices, params["quantizer"], cfg.quantizer, cfg.version)
    mel_len = z.shape[-1]
    mel_mask = (
        jnp.arange(mel_len)[None, :] < (feature_lengths * factor)[:, None]
    )
    z = z * mel_mask[:, None, :].astype(z.dtype)

    audio = hifigan_forward(z, params["head"], cfg.head, cfg.version)
    audio_len = audio.shape[-1]
    hop = cfg.spec_transform.hop_length
    audio_mask = (
        jnp.arange(audio_len)[None, :]
        < (feature_lengths * factor * hop)[:, None]
    )
    return audio * audio_mask[:, None, :].astype(audio.dtype)


def firefly_encode_mel(
    params: Dict, cfg: FireflyConfig, mel: jnp.ndarray
) -> jnp.ndarray:
    """(B, n_mels, T) log-mel -> (B, num_codebooks, T') int codes
    (reference: encoder.rs:38-43)."""
    mel = mel.astype(params["backbone"]["stem"]["conv"]["w"].dtype)
    features = convnext_encoder(mel, params["backbone"], cfg.backbone, cfg.version)
    return quantizer_encode(features, params["quantizer"], cfg.quantizer, cfg.version)


def init_firefly_params(
    rng: jax.Array, cfg: FireflyConfig, dtype=jnp.float32
) -> Dict:
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "backbone": init_convnext_encoder(k1, cfg.backbone, dtype),
        "quantizer": init_quantizer_params(k2, cfg.quantizer, dtype),
        "head": init_hifigan_params(k3, cfg.head, dtype),
    }


class FireflyCodec:
    """User-facing codec (reference: codec/firefly.rs:10-49)."""

    def __init__(
        self,
        params: Dict,
        cfg: FireflyConfig,
        *,
        buckets=DECODE_BUCKETS,
    ) -> None:
        self.params = params
        self.cfg = cfg
        self.sample_rate = cfg.spec_transform.sample_rate
        self.spec_transform = LogMelSpectrogram(cfg.spec_transform)
        self.buckets = buckets

        # params flow through as jit ARGUMENTS, never closure captures:
        # weights captured as jit constants get re-uploaded/ingested by the
        # compiler per program and blow compile time up by >10x on TPU.
        self._decode_jit = jax.jit(self._decode_fn)
        self._encode_jit = jax.jit(self._encode_fn)
        self._decode_aot: Dict = {}  # (b, c, tb) -> AOT-wrapped decode
        # Params identity for AOT seed keys (utils/aot.py): shapes+dtypes
        # of every leaf, so a dtype flip (f32 vs bf16 vocoder) or a
        # structure change can never hit a stale serialized program.
        leaves = jax.tree_util.tree_leaves(params)
        self._params_sig = tuple(
            (tuple(l.shape), str(l.dtype)) for l in leaves
        )
        self._step_jit: Dict = {}
        self._stream_init_cache: Dict = {}

    def _decode_fn(self, params, indices, feature_lengths):
        return firefly_decode(params, self.cfg, indices, feature_lengths)

    def _encode_fn(self, params, mel, mel_lengths):
        frame_mask = (
            jnp.arange(mel.shape[-1])[None, :] < mel_lengths[:, None]
        )
        # padded tail takes the log-clamp floor value, like silence would
        mel = jnp.where(frame_mask[:, None, :], mel, float(np.log(1e-5)))
        return firefly_encode_mel(params, self.cfg, mel)

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return n  # beyond the largest bucket: compile exact size

    def _decode_entry(self, b: int, c: int, tb: int):
        """Per-shape decode program, routed through the AOT seed store
        (utils/aot.py) so a cold process can skip the trace+lower of the
        vocoder graph — same mechanism as the LM engine's programs."""
        key = (b, c, tb)
        if key not in self._decode_aot:
            from fish_speech_tpu.utils import aot

            self._decode_aot[key] = aot.wrap(
                "codec_decode",
                (self.cfg, self._params_sig, b, c, tb),
                self._decode_jit,
                enabled=jax.device_count() == 1,
            )
        return self._decode_aot[key]

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """codes: (num_codebooks, T) or (B, C, T) -> (B, T*ds*hop) f32 PCM
        at 44.1 kHz, trimmed to the real length."""
        codes = np.asarray(codes)
        if codes.ndim == 2:
            codes = codes[None]
        b, c, t = codes.shape
        tb = self._bucket(t)
        padded = np.zeros((b, c, tb), np.int32)
        padded[:, :, :t] = codes
        lengths = jnp.full((b,), t, jnp.int32)
        audio = np.asarray(
            self._decode_entry(b, c, tb)(
                self.params, jnp.asarray(padded), lengths
            )
        )
        real = t * self.cfg.quantizer.total_downsample * self.cfg.spec_transform.hop_length
        return audio[:, 0, :real]

    def encode(self, audio: np.ndarray) -> np.ndarray:
        """audio: (T,) or (B, T) f32 at 44.1 kHz -> (B, num_codebooks, T')
        int32 codes."""
        audio = np.atleast_2d(np.asarray(audio, dtype=np.float32))
        mels = [self.spec_transform(row) for row in audio]
        t = max(m.shape[-1] for m in mels)
        tb = self._bucket(t)
        mel = np.zeros((audio.shape[0], self.cfg.spec_transform.n_mels, tb), np.float32)
        lengths = []
        for i, m in enumerate(mels):
            mel[i, :, : m.shape[-1]] = np.asarray(m[0])
            lengths.append(m.shape[-1])
        codes = np.asarray(
            self._encode_jit(
                self.params, jnp.asarray(mel), jnp.asarray(lengths, jnp.int32)
            )
        )
        # trim to the real (downsampled) code length of the longest row
        t_out = max(
            ln // self.cfg.quantizer.total_downsample for ln in lengths
        )
        return codes[:, :, :t_out]

    def decode_tail(
        self, codes: np.ndarray, new_frames: int, context_frames: int = 32
    ) -> np.ndarray:
        """Windowed incremental decode: given ALL codes so far
        (num_codebooks, T), return the PCM for just the last `new_frames`
        frames, decoded with `context_frames` of left context.

        Utility/back-compat API: the LIVE streaming mechanism is
        start_stream (carried state, each frame decoded once); the
        serving pipeline does not call this.

        Fish 1.4+ convolutions are causal (FishConvNet left-pads,
        FishTransConvNet right-trims — codec/utils/mod.rs:53-63,110-123),
        so with enough left context the tail samples equal the
        whole-sequence decode exactly; 32 code frames (~128 mel frames)
        comfortably covers the ConvNeXt+HiFiGAN receptive field. This is
        what gives the server sub-chunk time-to-first-audio: the reference
        vocodes only whole text chunks (handlers/speech.rs:94-110).
        """
        codes = np.asarray(codes)
        t = codes.shape[-1]
        new_frames = min(new_frames, t)
        start = max(t - new_frames - context_frames, 0)
        window = codes[:, start:]
        pcm = self.decode(window)[0]
        spf = (
            self.cfg.quantizer.total_downsample
            * self.cfg.spec_transform.hop_length
        )
        return pcm[(t - start - new_frames) * spf :]

    @property
    def samples_per_frame(self) -> int:
        """Output PCM samples per code frame (generic codec interface —
        MimiCodec has the same property)."""
        return (
            self.cfg.quantizer.total_downsample
            * self.cfg.spec_transform.hop_length
        )

    def frames_for_samples(self, n_samples: int) -> int:
        f = num_frames(
            n_samples, self.cfg.spec_transform.n_fft, self.cfg.spec_transform.hop_length
        )
        return f // self.cfg.quantizer.total_downsample

    # -- streaming (carried-state; Fish 1.4+ only) -------------------------

    @property
    def can_stream(self) -> bool:
        """Fish 1.4+ decode is fully causal (FishConvNet left-pad /
        FishTransConvNet right-trim, codec/utils/mod.rs:53-62,110-122);
        1.2's symmetric padding is not streamable."""
        return self.cfg.version != FishVersion.V1_2

    def start_stream(
        self, batch: int = 1, max_step_frames: int = 32
    ) -> "FireflyStreamSession":
        """Open a carried-state streaming decode session: feed code frames
        incrementally, receive exactly the PCM the batch decode would
        produce for the growing prefix — each frame decoded ONCE (vs
        decode_tail's left-context recompute). Same session API as
        MimiCodec.start_stream."""
        if not self.can_stream:
            raise ValueError("Fish 1.2 codec decode is not streamable")
        return FireflyStreamSession(self, batch, max_step_frames)

    def decode_step(self, codes: np.ndarray, state):
        """One streaming step: codes (C, t) or (B, C, t) -> (pcm
        (B, t*ds*hop), new_state). Use start_stream() for chunk-size
        bucketing; state comes from firefly_stream.stream_state_init.

        Any chunk size t >= 1 is exact: every strided op in the decode
        path is a TRANSPOSED conv whose overlap-add tail carry
        (stream_conv.stream_conv_transpose1d) is chunk-size-invariant.
        The multiple-of-stride restriction on stream_conv1d applies only
        to the encode-side downsample stack, which has no streaming
        entry point."""
        audio, state = self.decode_step_async(codes, state)
        return np.asarray(audio, np.float32), state

    def decode_step_async(self, codes: np.ndarray, state):
        """decode_step without the device->host sync: returns the PCM as
        a DEVICE array (B, t*ds*hop). Lets a session dispatch several
        pieces back to back and fetch them in ONE round trip — through a
        remote-device tunnel each synchronous fetch costs a full RTT
        (stream_conv.StreamSessionBase.feed)."""
        from fish_speech_tpu.models.codec.firefly_stream import (
            firefly_decode_step,
        )

        codes = np.asarray(codes)
        if codes.ndim == 2:
            codes = codes[None]
        key = ("step", codes.shape)
        if key not in self._step_jit:
            from fish_speech_tpu.utils import aot

            self._step_jit[key] = aot.wrap(
                "codec_step",
                (self.cfg, self._params_sig, codes.shape),
                jax.jit(
                    lambda p, c, s: firefly_decode_step(c, p, self.cfg, s)
                ),
                enabled=jax.device_count() == 1,
            )
        audio, state = self._step_jit[key](
            self.params, jnp.asarray(codes, jnp.int32), state
        )
        return audio[:, 0, :], state


class FireflyStreamSession(StreamSessionBase):
    """Stateful incremental Firefly decoder over one audio stream
    (session mechanics in stream_conv.StreamSessionBase): feed(codes
    (C, t)) returns the PCM for exactly those t frames; the concatenation
    over calls equals FireflyCodec.decode of the full code sequence."""

    def _template(self):
        # The zero init state is immutable (feed threads NEW state through
        # decode_step), so one template per batch size is shared by every
        # session. Built under ONE jit: eager per-leaf jnp.zeros would
        # compile+dispatch ~126 tiny device programs, measured at ~17 s of
        # compiles in start_stream plus ~24 s of serialized remote
        # executions draining behind it on a cold 1-vCPU host through the
        # axon tunnel (docs/TPU_NOTES.md #14). stream_state_init reads the
        # params only for shapes/dtypes, so no weights are baked into the
        # traced program as constants.
        cache = self.codec._stream_init_cache
        if self.batch not in cache:
            from fish_speech_tpu.models.codec.firefly_stream import (
                stream_state_init,
            )

            cache[self.batch] = jax.jit(
                lambda: stream_state_init(
                    self.codec.params, self.codec.cfg, self.batch
                )
            )()
        return cache[self.batch]
