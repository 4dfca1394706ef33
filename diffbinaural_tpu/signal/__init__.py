from .stft import (
    mel_filterbank,
    hann_window,
    stft_magnitude,
    mel_spectrogram,
    dynamic_range_compression,
    dynamic_range_decompression,
)
from .filters import (
    kaiser_sinc_filter1d,
    LowPassFilter1d,
    UpSample1d,
    DownSample1d,
)
