"""Full-chain MFCC regression anchor.

An independent float64 numpy implementation of the torchaudio MFCC spec
(hann → rDFT → power → HTK mel (no norm) → per-clip top-80dB → ortho DCT-II)
is computed inside the test and compared against the production JAX path.
This catches any regression in the chain end-to-end, independent of the
building-block tests.
"""

import numpy as np

import jax.numpy as jnp

from audiobd_tpu.dsp import MFCCParams, mfcc


def numpy_mfcc_reference(x, sr, n_mfcc, n_fft, hop, n_mels=128):
    x = np.asarray(x, np.float64)
    pad = n_fft // 2
    xp = np.pad(x, pad, mode="reflect")
    n_frames = 1 + (len(xp) - n_fft) // hop
    win = 0.5 * (1 - np.cos(2 * np.pi * np.arange(n_fft) / n_fft))
    frames = np.stack([xp[i * hop : i * hop + n_fft] * win for i in range(n_frames)])
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (frames, bins)

    # HTK mel filterbank, no normalization.
    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    n_bins = n_fft // 2 + 1
    freqs = np.linspace(0, sr / 2, n_bins)
    pts = mel2hz(np.linspace(hz2mel(0.0), hz2mel(sr / 2), n_mels + 2))
    fb = np.zeros((n_bins, n_mels))
    for m in range(n_mels):
        lo, ctr, hi = pts[m], pts[m + 1], pts[m + 2]
        up = (freqs - lo) / (ctr - lo)
        down = (hi - freqs) / (hi - ctr)
        fb[:, m] = np.maximum(0, np.minimum(up, down))
    melspec = spec @ fb

    db = 10.0 * np.log10(np.maximum(melspec, 1e-10))
    db = np.maximum(db, db.max() - 80.0)

    n = np.arange(n_mels)[:, None]
    k = np.arange(n_mfcc)[None, :]
    dct = np.cos(np.pi / n_mels * (n + 0.5) * k)
    dct[:, 0] /= np.sqrt(2)
    dct *= np.sqrt(2 / n_mels)
    return db @ dct  # (frames, n_mfcc)


def test_full_chain_matches_fp64_reference(rng):
    sr, n_mfcc, n_fft, hop = 16000, 40, 400, 160
    x = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    ours = np.asarray(mfcc(jnp.asarray(x), MFCCParams(sr, n_mfcc, n_fft, hop)))
    ref = numpy_mfcc_reference(x, sr, n_mfcc, n_fft, hop)
    assert ours.shape == ref.shape == (101, 40)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-3)


def test_full_chain_structured_signal(rng):
    """A tone must put its energy in the right MFCC region deterministically."""
    sr = 16000
    t = np.arange(sr) / sr
    x = (0.4 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    ours = np.asarray(mfcc(jnp.asarray(x), MFCCParams(sr, 40, 400, 160)))
    ref = numpy_mfcc_reference(x, sr, 40, 400, 160)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-3)
