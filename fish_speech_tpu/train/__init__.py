from fish_speech_tpu.train.loss import dual_ar_loss, fast_forward_teacher, slow_forward_full
from fish_speech_tpu.train.step import TrainConfig, init_train_state, make_train_step

__all__ = [
    "dual_ar_loss",
    "fast_forward_teacher",
    "slow_forward_full",
    "TrainConfig",
    "init_train_state",
    "make_train_step",
]
