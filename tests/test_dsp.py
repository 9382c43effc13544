"""DSP front-end golden tests.

torchaudio/librosa are not installed in this image, so parity is established
against *independent* implementations of the same published specs:
  * STFT vs torch.stft (FFT-based, core torch) — our matmul-DFT must match.
  * DCT vs scipy.fft.dct(type=2, norm='ortho').
  * Mel scales vs known anchor values (HTK mel(1000 Hz) ≈ 998.99;
    Slaney mel(1000 Hz) = 15 by construction).
  * Frame-count parity with the reference's shape table
    (reference attack_config.txt:18-22: 100/101/32 frames).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.fft
import torch

from audiobd_tpu.dsp import (
    MFCCParams,
    amplitude_to_db,
    dct_matrix,
    mel_filterbank,
    mfcc,
    mfcc_features,
    num_frames,
    power_spectrogram,
    resample,
)
from audiobd_tpu.dsp.mel import hz_to_mel, mel_to_hz


def _rand_wave(rng, t=16000, batch=()):
    return (rng.standard_normal(batch + (t,)) * 0.1).astype(np.float32)


@pytest.mark.parametrize(
    "sr,n_fft,hop,expected_frames",
    [(16000, 400, 160, 101), (44100, 1103, 441, 100), (16000, 2048, 512, 32)],
)
def test_frame_count_matches_reference_shapes(sr, n_fft, hop, expected_frames):
    assert num_frames(sr, n_fft, hop) == expected_frames


@pytest.mark.parametrize("n_fft,hop", [(400, 160), (1103, 441), (2048, 512)])
def test_power_spectrogram_matches_torch_stft(rng, n_fft, hop):
    x = _rand_wave(rng, t=8000)
    ours = np.asarray(power_spectrogram(jnp.asarray(x), n_fft, hop, pad_mode="reflect"))

    xt = torch.from_numpy(x)
    win = torch.hann_window(n_fft, periodic=True)
    ref = torch.stft(
        xt, n_fft, hop_length=hop, window=win, center=True,
        pad_mode="reflect", return_complex=True, onesided=True,
    )
    ref_power = (ref.abs() ** 2).numpy().T  # (frames, bins)

    assert ours.shape == ref_power.shape
    np.testing.assert_allclose(ours, ref_power, rtol=1e-3, atol=1e-4)


def test_power_spectrogram_constant_pad_matches_torch(rng):
    x = _rand_wave(rng, t=4096)
    ours = np.asarray(power_spectrogram(jnp.asarray(x), 2048, 512, pad_mode="constant"))
    xt = torch.from_numpy(x)
    win = torch.hann_window(2048, periodic=True)
    ref = torch.stft(
        xt, 2048, hop_length=512, window=win, center=True,
        pad_mode="constant", return_complex=True, onesided=True,
    )
    ref_power = (ref.abs() ** 2).numpy().T
    np.testing.assert_allclose(ours, ref_power, rtol=1e-3, atol=1e-4)


def test_dct_matrix_matches_scipy():
    n_mels, n_mfcc = 128, 40
    dct = dct_matrix(n_mfcc, n_mels, norm="ortho")
    x = np.random.default_rng(0).standard_normal((7, n_mels)).astype(np.float32)
    ours = x @ dct
    ref = scipy.fft.dct(x, type=2, norm="ortho", axis=-1)[:, :n_mfcc]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_mel_scale_anchor_values():
    assert abs(hz_to_mel(np.array(1000.0), "htk") - 2595.0 * np.log10(1 + 1000 / 700)) < 1e-9
    assert abs(hz_to_mel(np.array(1000.0), "slaney") - 15.0) < 1e-9
    # Round trips
    for scale in ("htk", "slaney"):
        f = np.linspace(0, 8000, 50)
        np.testing.assert_allclose(mel_to_hz(hz_to_mel(f, scale), scale), f, rtol=1e-9, atol=1e-6)


def test_mel_filterbank_properties():
    fb = mel_filterbank(16000, 400, n_mels=128, scale="htk", norm=None)
    assert fb.shape == (201, 128)
    assert fb.min() >= 0.0
    # With 201 bins over 128 filters some narrow low-frequency filters have
    # zero mass (torchaudio emits the same warning); most filters have mass.
    assert (fb.sum(axis=0) > 0).mean() > 0.8
    fb_sl = mel_filterbank(16000, 2048, n_mels=128, scale="slaney", norm="slaney")
    assert fb_sl.shape == (1025, 128)
    # Slaney norm: each filter area ~ 2/bandwidth — peaks shrink with frequency.
    assert fb_sl.max(axis=0)[10] > fb_sl.max(axis=0)[100]


def test_amplitude_to_db_per_clip_topdb():
    spec = jnp.stack([
        jnp.full((4, 4), 1.0).at[0, 0].set(1e12),   # clip 0: huge max
        jnp.full((4, 4), 1.0),                      # clip 1: flat
    ])
    db = np.asarray(amplitude_to_db(spec, top_db=80.0, per_clip_dims=2))
    # clip 0 floor = 120 dB - 80 = 40 dB, so the 0 dB cells clamp to 40.
    assert abs(db[0, 1, 1] - 40.0) < 1e-4
    # clip 1 is untouched (max 0 dB, floor -80).
    assert abs(db[1, 1, 1] - 0.0) < 1e-4


@pytest.mark.parametrize(
    "sr,n_mfcc,n_fft,hop,frames",
    [(16000, 40, 400, 160, 101), (44100, 40, 1103, 441, 100), (16000, 13, 2048, 512, 32)],
)
def test_mfcc_shapes_and_batching(rng, sr, n_mfcc, n_fft, hop, frames):
    params = MFCCParams(sample_rate=sr, n_mfcc=n_mfcc, n_fft=n_fft, hop_length=hop)
    x = _rand_wave(rng, t=sr, batch=(3,))
    out = mfcc(jnp.asarray(x), params)
    assert out.shape == (3, frames, n_mfcc)
    # Batch row == single-clip result.
    single = mfcc(jnp.asarray(x[1]), params)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(single), rtol=1e-5, atol=1e-5)
    # Model-input layout.
    feats = mfcc_features(jnp.asarray(x)[:, None, :], params)
    assert feats.shape == (3, 1, frames, n_mfcc)


def test_mfcc_librosa_mode_runs_and_differs(rng):
    x = jnp.asarray(_rand_wave(rng))
    ta = mfcc(x, MFCCParams(n_fft=2048, hop_length=512, parity="torchaudio"))
    lr = mfcc(x, MFCCParams(n_fft=2048, hop_length=512, parity="librosa"))
    assert ta.shape == lr.shape == (32, 40)
    assert not np.allclose(np.asarray(ta), np.asarray(lr))


def test_mfcc_is_differentiable(rng):
    params = MFCCParams(sample_rate=16000, n_mfcc=13, n_fft=2048, hop_length=512)
    x = jnp.asarray(_rand_wave(rng, t=16000))

    def loss(w):
        return jnp.sum(mfcc(w, params) ** 2)

    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert float(jnp.abs(g).max()) > 0.0


def test_mfcc_jits_once(rng):
    params = MFCCParams()
    f = jax.jit(lambda w: mfcc_features(w, params))
    x = jnp.asarray(_rand_wave(rng, batch=(2,)))
    out = f(x)
    assert out.shape == (2, 1, 101, 40)


def test_resample_preserves_sine(rng):
    sr, new_sr = 16000, 44100
    t = np.arange(sr) / sr
    freq = 440.0
    x = np.sin(2 * np.pi * freq * t).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x), sr, new_sr))
    assert y.shape[-1] == int(np.ceil(sr * new_sr / sr))  # == 44100
    # The resampled signal should still be a 440 Hz sine: compare against
    # the analytic sine on the new grid, ignoring filter edge transients.
    t2 = np.arange(y.shape[-1]) / new_sr
    expected = np.sin(2 * np.pi * freq * t2).astype(np.float32)
    core = slice(500, -500)
    err = np.abs(y[core] - expected[core]).max()
    # ~0.5% ripple is inherent to the width-6 windowed sinc (torchaudio's
    # default kernel has the same ripple).
    assert err < 1e-2, err


def test_resample_identity():
    x = jnp.ones((2, 100))
    assert resample(x, 16000, 16000) is x


def test_resample_matches_scipy_polyphase(rng):
    # scipy.resample_poly with a comparable kaiser-ish filter won't match
    # bit-for-bit, but energy and length must agree.
    import scipy.signal

    x = _rand_wave(rng, t=16000)
    y = np.asarray(resample(jnp.asarray(x), 16000, 8000))
    y_ref = scipy.signal.resample_poly(x, 1, 2)
    assert y.shape == y_ref.shape
    # Downsampled energy within a few percent of scipy's.
    assert abs(np.linalg.norm(y) - np.linalg.norm(y_ref)) / np.linalg.norm(y_ref) < 0.05
