"""Waveform → MFCC, batched, jittable, differentiable.

The whole pipeline is matmuls + elementwise ops:

    frames (gather) → @ windowed-DFT bases → |.|² → @ mel fb → dB → @ DCT

so one jit of ``mfcc_features`` compiles to a handful of fused MXU ops.
FlowMur's gradient-based trigger synthesis differentiates straight through
this (the reference needs torch autograd through torchaudio's T.MFCC,
utils/flowmur_generate_trigger.py:64-105).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from audiobd_tpu.dsp import mel as _mel
from audiobd_tpu.dsp import stft as _stft

_HIGH = jax.lax.Precision.HIGHEST


@dataclass(frozen=True)
class MFCCParams:
    sample_rate: int = 16000
    n_mfcc: int = 40
    n_fft: int = 400
    hop_length: int = 160
    n_mels: int = 128
    parity: str = "torchaudio"  # or "librosa"
    top_db: float | None = 80.0

    @property
    def pad_mode(self) -> str:
        # torch.stft center-pads with 'reflect'; librosa.stft (>=0.10, the
        # version era of the reference) center-pads with 'constant'.
        return "reflect" if self.parity == "torchaudio" else "constant"

    @property
    def mel_scale(self) -> str:
        return "htk" if self.parity == "torchaudio" else "slaney"

    @property
    def mel_norm(self) -> str | None:
        return None if self.parity == "torchaudio" else "slaney"


def mfcc(x: jax.Array, params: MFCCParams) -> jax.Array:
    """MFCC of ``x`` (..., T) → (..., n_frames, n_mfcc), time-major.

    Matches torchaudio T.MFCC (reference prepare_dataset.py:35-47) or
    librosa.feature.mfcc (reference utils/daba_injection_tools.py:29-35)
    depending on ``params.parity``, except in (frames, mfcc) layout — the
    layout the reference immediately transposes to anyway (.T[np.newaxis]
    at prepare_dataset.py:65).
    """
    spec = _stft.power_spectrogram(
        x, params.n_fft, params.hop_length, center=True, pad_mode=params.pad_mode
    )  # (..., frames, bins)
    fb = jnp.asarray(
        _mel.mel_filterbank(
            params.sample_rate,
            params.n_fft,
            n_mels=params.n_mels,
            scale=params.mel_scale,
            norm=params.mel_norm,
        )
    )
    melspec = jnp.matmul(spec, fb, precision=_HIGH)  # (..., frames, n_mels)
    db = _mel.amplitude_to_db(melspec, top_db=params.top_db, per_clip_dims=2)
    dct = jnp.asarray(_mel.dct_matrix(params.n_mfcc, params.n_mels, norm="ortho"))
    return jnp.matmul(db, dct, precision=_HIGH)  # (..., frames, n_mfcc)


def mfcc_features(wavs: jax.Array, params: MFCCParams) -> jax.Array:
    """Batched model-input features: (B, T) or (B, 1, T) → (B, 1, frames, n_mfcc).

    This is the canonical feature layout of the framework — NCHW with a
    singleton channel, time on H, coefficient on W — matching the reference's
    cached npy layout (reference attack_config.txt:18-22).
    """
    # Squeeze an explicit channel dim (B, 1, T); a 2-D input is always (B, T)
    # — even with B == 1.
    if wavs.ndim >= 3 and wavs.shape[-2] == 1:
        wavs = jnp.squeeze(wavs, axis=-2)
    feats = mfcc(wavs, params)
    return feats[..., None, :, :]
