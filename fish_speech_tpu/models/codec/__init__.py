"""FireflyGAN-VQ codec: FSQ quantizer, ConvNeXt encoder, HiFiGAN decoder."""

from fish_speech_tpu.models.codec.firefly import (  # noqa: F401
    FireflyCodec,
    FireflyStreamSession,
    init_firefly_params,
)
