"""Audio DSP and container IO: log-mel spectrogram, resampling, WAV."""

from fish_speech_tpu.audio.mel import LogMelSpectrogram  # noqa: F401
from fish_speech_tpu.audio.resample import (  # noqa: F401
    StreamingResampler,
    resample,
)
from fish_speech_tpu.audio.wav import read_wav, write_pcm_as_wav  # noqa: F401
