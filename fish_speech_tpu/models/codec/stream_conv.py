"""Generic carried-state streaming primitives for causal 1-D conv stacks.

Both streaming codecs are built on these: Mimi's SEANet decoder
(models/codec/mimi.py) and the Firefly streaming decoder
(models/codec/firefly_stream.py). The contract: feeding a sequence in
chunks of any sizes produces exactly the concatenation the whole-sequence
(batch) decode would — because

* a causal conv (left zero-pad of (k-1)*d + 1 - stride, the Fish 1.4+
  FishConvNet convention, reference codec/utils/mod.rs:53-62, which the
  streaming state reproduces by carrying the last pad_left input samples;
  zeros initially == the batch path's zero pad), and
* a causal transposed conv (right-trim of k - stride, FishTransConvNet,
  mod.rs:110-122) whose trimmed tail is exactly the contribution of the
  current chunk into the next chunk's first samples — carried and
  overlap-added instead of trimmed.

are the only time-coupled ops; everything else is pointwise per position.

Weights follow torch layout: conv (O, I/groups, K); transposed conv
(I, O/groups, K).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv_state(batch, c_in, k, *, stride=1, dilation=1, dtype=jnp.float32):
    """Zero-initialized carried input tail for `stream_conv1d`."""
    pad_left = (k - 1) * dilation + 1 - stride
    return jnp.zeros((batch, c_in, pad_left), dtype)


def conv_transpose_state(batch, c_out, k, *, stride, dtype=jnp.float32):
    """Zero-initialized carried output tail for `stream_conv_transpose1d`."""
    return jnp.zeros((batch, c_out, max(k - stride, 0)), dtype)


def stream_conv1d(x, w, b, state, *, stride=1, dilation=1, groups=1):
    """Streaming causal conv: `state` holds the previous pad_left input
    samples (zeros initially == the batch path's left zero-pad). Chunk
    length must be a multiple of `stride` so no right pad is needed.
    Returns (out, new_state)."""
    k_eff = (w.shape[-1] - 1) * dilation + 1
    pad_left = k_eff - stride
    if pad_left:
        xin = jnp.concatenate([state, x], axis=-1)
        new_state = xin[..., xin.shape[-1] - pad_left :]
    else:
        xin, new_state = x, state
    out = jax.lax.conv_general_dilated(
        xin,
        w,
        window_strides=(stride,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b[None, :, None]
    return out, new_state


def conv_transpose_raw(x, w, *, stride: int, groups: int = 1):
    """Full (untrimmed, bias-free) transposed conv, torch semantics.
    x: (B, C_in, T); w: (C_in, C_out/groups, K) -> (B, C_out, (T-1)*s+K)."""
    k = w.shape[-1]
    if groups > 1:
        # grouped transposed conv: XLA's conv_transpose has no grouping;
        # run the equivalent fractionally-strided regular conv
        # (zero-insert stride-1 between inputs, pad k-1, correlate with
        # the time-reversed kernel) with feature_group_count.
        c_in = x.shape[1]
        x_dil = jnp.zeros(
            (x.shape[0], c_in, (x.shape[-1] - 1) * stride + 1), x.dtype
        )
        x_dil = x_dil.at[:, :, ::stride].set(x)
        x_dil = jnp.pad(x_dil, ((0, 0), (0, 0), (k - 1, k - 1)))
        g_in = c_in // groups
        w_reg = w.reshape(groups, g_in, w.shape[1], k)
        w_reg = jnp.flip(w_reg, axis=-1)
        w_reg = w_reg.transpose(0, 2, 1, 3).reshape(groups * w.shape[1], g_in, k)
        return jax.lax.conv_general_dilated(
            x_dil,
            w_reg,
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=groups,
        )
    # transpose_kernel=True matches torch ConvTranspose1d (gradient of
    # conv: zero-insertion + correlation with the flipped kernel); torch
    # weight (C_in, C_out, K) is the FORWARD conv's (O, I, K).
    return jax.lax.conv_transpose(
        x,
        w,
        strides=(stride,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        transpose_kernel=True,
    )


def stream_conv_transpose1d(x, w, b, state, *, stride, groups=1):
    """Streaming causal transposed conv (right-trim convention):
    overlap-add the carried (bias-free) tail onto this chunk's head, emit
    T*stride samples, carry the new k-stride tail. Returns
    (out, new_state)."""
    k = w.shape[-1]
    out = conv_transpose_raw(x, w, stride=stride, groups=groups)
    tail = max(k - stride, 0)  # same domain as conv_transpose_state
    if tail:
        out = out.at[..., :tail].add(state)
        new_state = out[..., out.shape[-1] - tail :]
        out = out[..., : out.shape[-1] - tail]
    else:
        new_state = state
    if b is not None:
        out = out + b[None, :, None]
    return out, new_state


class StreamSessionBase:
    """Shared session mechanics for carried-state streaming codecs
    (FireflyStreamSession / MimiStreamSession).

    feed(codes (K, t) or (B, K, t)) returns the PCM for exactly those t
    frames; the concatenation over calls equals the codec's batch decode
    of the full code sequence. Chunks are decomposed into power-of-two
    pieces so at most log2(max_step)+1 distinct chunk lengths ever reach
    the jit cache (a ragged tail would otherwise compile the full decoder
    once per novel length, mid-stream).

    Subclasses implement `_template()` returning the (shared, immutable)
    zero init state for the current batch size; the owning codec provides
    `decode_step(codes, state) -> (pcm, new_state)`.
    """

    def __init__(self, codec, batch: int, max_step_frames: int):
        self.codec = codec
        self.batch = batch
        self.max_step = 1 << (max(1, max_step_frames) - 1).bit_length()
        self.state = self._template()

    def _template(self):
        raise NotImplementedError

    def feed(self, codes):
        import numpy as np

        codes = np.asarray(codes)
        if codes.ndim == 2:
            codes = codes[None]
        parts = []
        s, t = 0, codes.shape[-1]
        while s < t:
            # largest power-of-two piece <= max_step that fits
            step = min(self.max_step, t - s)
            step = 1 << (step.bit_length() - 1)
            # NOTE: per-piece synchronous fetch is DELIBERATE. An async
            # dispatch-all-then-one-device_get variant was measured
            # (round 3): single-stream feed(17) improved ~10 ms, but
            # 16 concurrent sessions regressed ~70 ms p50 — the per-piece
            # sync backpressures threads sharing one chip. Keep sync;
            # decode_step_async exists for callers that manage their own
            # batching.
            pcm, self.state = self.codec.decode_step(
                codes[..., s : s + step], self.state
            )
            parts.append(pcm)
            s += step
        if not parts:
            return np.zeros((codes.shape[0], 0), np.float32)
        return np.concatenate(parts, axis=-1)

    def feed_async(self, codes, pad_to=None):
        """Dispatch ONE streaming decode step and return the PCM as a
        DEVICE array (B, t'*spf) WITHOUT syncing — the overlapped
        blocking driver (generate/overlap.py) queues vocode programs
        behind LM decode chunks and fetches everything in one round trip
        at the end.

        pad_to: right-pad the codes to this many frames with zeros so
        every feed hits ONE compiled program (the decode path is causal,
        so padded future frames cannot alter the real frames' samples —
        the caller trims the tail of the LAST feed). Bypasses feed()'s
        power-of-two decomposition and its deliberate per-piece sync."""
        import numpy as np

        codes = np.asarray(codes)
        if codes.ndim == 2:
            codes = codes[None]
        t = codes.shape[-1]
        if pad_to is not None and t < pad_to:
            pad = np.zeros(
                (*codes.shape[:-1], pad_to - t), codes.dtype
            )
            codes = np.concatenate([codes, pad], axis=-1)
        step = getattr(self.codec, "decode_step_async", None)
        if step is not None:
            audio, self.state = step(codes, self.state)
        else:
            audio, self.state = self.codec.decode_step(codes, self.state)
        return audio, t

    def reset(self, batch=None) -> None:
        """Restart the stream (the reference's reset_state, mimi.rs:84-88).
        Keeps the session's batch size unless explicitly overridden."""
        if batch is not None:
            self.batch = batch
        self.state = self._template()
