from lasr_tpu.ops.fbank import KaldiFbankConfig, log_mel_fbank, fbank_num_frames
from lasr_tpu.ops.ctc import ctc_loss
from lasr_tpu.ops.specaug import spec_augment

__all__ = [
    "KaldiFbankConfig",
    "log_mel_fbank",
    "fbank_num_frames",
    "ctc_loss",
    "spec_augment",
]
