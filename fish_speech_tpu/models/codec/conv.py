"""1-D convolution primitives with Fish Speech's padding conventions.

Counterpart of FishConvNet / FishTransConvNet
(reference: fish_speech_core/lib/codec/utils/mod.rs):

* Fish 1.4+ convs are CAUSAL: left zero-pad of (k-1)*d + 1 - stride, no
  other padding (mod.rs:53-62). This is what makes streaming codec decode
  possible — exploit it for chunked vocoding.
* Fish 1.2 uses plain symmetric padding supplied by the call site.
* Fish 1.4+ transposed convs trim k - stride samples from the RIGHT of
  the output (mod.rs:110-122); 1.2 uses symmetric conv-transpose padding.

Weights follow torch layout: conv (O, I/groups, K); conv-transpose
(I, O, K).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from fish_speech_tpu.config import FishVersion


def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    *,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    padding: Tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    """x: (B, C, T), w: (O, I/groups, K) -> (B, O, T')."""
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[padding],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b[None, :, None]
    return out


def fish_conv1d(
    x: jnp.ndarray,
    p: Dict[str, jnp.ndarray],
    *,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    version: FishVersion = FishVersion.V1_5,
    pad_1_2: int = 0,
) -> jnp.ndarray:
    """FishConvNet forward (reference: mod.rs:53-62)."""
    w, b = p["w"], p.get("b")
    k = w.shape[-1]
    if version == FishVersion.V1_2:
        padding = (pad_1_2, pad_1_2)
    else:
        left = (k - 1) * dilation + 1 - stride
        padding = (left, 0)
    return conv1d(
        x, w, b, stride=stride, dilation=dilation, groups=groups, padding=padding
    )


def conv_transpose1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    *,
    stride: int,
) -> jnp.ndarray:
    """Full (VALID) transposed conv. x: (B, C, T), w: (I, O, K) torch layout.
    Output length (T-1)*stride + K."""
    # With transpose_kernel=True the "O"/"I" labels refer to the FORWARD
    # conv the kernel came from, so torch's (in, out, k) layout maps to
    # spec "OIH" (verified against torch.nn.functional.conv_transpose1d).
    out = jax.lax.conv_transpose(
        x,
        w,
        strides=(stride,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        transpose_kernel=True,
    )
    if b is not None:
        out = out + b[None, :, None]
    return out


def fish_conv_transpose1d(
    x: jnp.ndarray,
    p: Dict[str, jnp.ndarray],
    *,
    stride: int,
    version: FishVersion = FishVersion.V1_5,
    pad_1_2: int = 0,
) -> jnp.ndarray:
    """FishTransConvNet forward (reference: mod.rs:110-122)."""
    w, b = p["w"], p.get("b")
    k = w.shape[-1]
    out = conv_transpose1d(x, w, b, stride=stride)
    if version == FishVersion.V1_2:
        if pad_1_2 > 0:
            out = out[:, :, pad_1_2:-pad_1_2]
    else:
        trim = max(k - stride, 0)
        if trim > 0:
            out = out[:, :, :-trim]
    return out
