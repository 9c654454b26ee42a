"""Core TPU compute ops: RoPE, norms, GQA attention, on-device sampling.

These are the building blocks the DualAR LM and codec are assembled from.
Everything is shape-static and jit-friendly; the hot decode path never
leaves the device.
"""

from fish_speech_tpu.ops.rope import precompute_freqs_cis, apply_rope_interleaved  # noqa: F401
from fish_speech_tpu.ops.norms import rms_norm, layer_norm  # noqa: F401
from fish_speech_tpu.ops.attention import gqa_attention  # noqa: F401
from fish_speech_tpu.ops.sampling import (  # noqa: F401
    SamplingArgs,
    sample_top_k_top_p,
    RepPenWindow,
)
