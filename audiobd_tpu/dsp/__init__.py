"""TPU-native audio DSP front-end.

The reference delegates all DSP to third-party wheels (torchaudio's T.MFCC at
prepare_dataset.py:35-47, librosa.feature.mfcc at
utils/daba_injection_tools.py:29-35). Here the whole waveform→MFCC pipeline is
expressed as dense matmuls (framing → windowed DFT → mel projection → log →
DCT-II) so XLA tiles it onto the MXU, it is differentiable end-to-end (needed
for FlowMur trigger optimization), and it can be fused further with Pallas
(``audiobd_tpu.ops``).
"""

from audiobd_tpu.dsp.mfcc import mfcc, mfcc_features, MFCCParams
from audiobd_tpu.dsp.stft import power_spectrogram, frame_signal, num_frames
from audiobd_tpu.dsp.mel import (
    mel_filterbank,
    dct_matrix,
    amplitude_to_db,
    power_to_db,
)
from audiobd_tpu.dsp.resample import resample

__all__ = [
    "mfcc",
    "mfcc_features",
    "MFCCParams",
    "power_spectrogram",
    "frame_signal",
    "num_frames",
    "mel_filterbank",
    "dct_matrix",
    "amplitude_to_db",
    "power_to_db",
    "resample",
]
