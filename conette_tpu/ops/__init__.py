from conette_tpu.ops.frontend import DEFAULT_LOGMEL, LogMelConfig, logmel_spectrogram
from conette_tpu.ops.mel import mel_filterbank, power_to_db
from conette_tpu.ops.resample import resample, resample_numpy, resampled_length
from conette_tpu.ops.stft import hann_window, num_frames, power_spectrogram

__all__ = [
    "DEFAULT_LOGMEL",
    "LogMelConfig",
    "logmel_spectrogram",
    "mel_filterbank",
    "power_to_db",
    "resample",
    "resample_numpy",
    "resampled_length",
    "hann_window",
    "num_frames",
    "power_spectrogram",
]
