"""Model definitions: the DualAR LM and the FireflyGAN-VQ codec."""

from fish_speech_tpu.models.dual_ar import (  # noqa: F401
    DualARParams,
    KVCache,
    init_dual_ar_params,
    embed_tokens,
    slow_prefill,
    slow_decode_step,
    fast_hist_init,
    fast_step,
)
