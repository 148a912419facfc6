from emg_tpu.dsp.filters import (  # noqa: F401
    filtfilt,
    filtfilt_masked,
    lfilter,
    notch,
    notch_harmonics,
    remove_drift,
)
from emg_tpu.dsp.resample import subsample, subsample_masked, subsample_length  # noqa: F401
from emg_tpu.dsp.features import get_emg_features, get_emg_features_masked, double_average  # noqa: F401
from emg_tpu.dsp.mel import mel_spectrogram, mel_filterbank  # noqa: F401
from emg_tpu.dsp.normalizer import FeatureNormalizer, load_normalizers, save_normalizers  # noqa: F401
from emg_tpu.dsp.audio_io import load_audio, read_audio  # noqa: F401
from emg_tpu.dsp.pipeline import preprocess_emg, preprocess_emg_host, Preprocessed  # noqa: F401
