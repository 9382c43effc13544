"""Framed, matmul-based STFT.

TPU-first design: instead of an FFT (which XLA lowers poorly for the small,
odd FFT sizes this domain uses — n_fft 400/1103/2048), the DFT is two dense
matmuls with precomputed cosine/sine bases. The window folds into the bases,
so ``power = (F @ Bc)^2 + (F @ Bs)^2`` with F the raw frame matrix — two
MXU matmuls plus a fused elementwise square-add. For 1 s clips this is
exact (no FFT error accumulation) and trivially differentiable.

Semantics follow torch.stft / librosa.stft with ``center=True``:
  frames = 1 + floor((T + 2*(n_fft//2) - n_fft) / hop)
which reproduces the reference's 100/101/32-frame shapes
(reference attack_config.txt:18-22; quirk documented in SURVEY.md §6b.2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_HIGH = jax.lax.Precision.HIGHEST


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window / scipy fftbins=True)."""
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float64)


def num_frames(n_samples: int, n_fft: int, hop_length: int, center: bool = True) -> int:
    if center:
        n_samples = n_samples + 2 * (n_fft // 2)
    return 1 + (n_samples - n_fft) // hop_length


@functools.lru_cache(maxsize=32)
def _dft_bases(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT bases, shape (n_fft, n_fft//2 + 1) each."""
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    angle = 2.0 * np.pi * n * k / n_fft
    win = hann_window(n_fft)[:, None]
    cos_b = (np.cos(angle) * win).astype(np.float32)
    sin_b = (-np.sin(angle) * win).astype(np.float32)
    return cos_b, sin_b


def frame_signal(
    x: jax.Array, n_fft: int, hop_length: int, center: bool = True, pad_mode: str = "reflect"
) -> jax.Array:
    """Slice ``x`` (..., T) into overlapping frames (..., n_frames, n_fft)."""
    if center:
        pad = n_fft // 2
        pad_width = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        if pad_mode == "reflect":
            x = jnp.pad(x, pad_width, mode="reflect")
        else:
            x = jnp.pad(x, pad_width, mode="constant")
    t = x.shape[-1]
    n_frames = 1 + (t - n_fft) // hop_length
    # Static gather index matrix — XLA turns this into strided loads.
    idx = (np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]).astype(np.int32)
    return x[..., idx]


def power_spectrogram(
    x: jax.Array,
    n_fft: int,
    hop_length: int,
    center: bool = True,
    pad_mode: str = "reflect",
    power: float = 2.0,
) -> jax.Array:
    """Hann-windowed power spectrogram of ``x`` (..., T) → (..., n_frames, n_bins).

    Note: returns time-major (frames, bins) layout — the natural matmul layout;
    callers needing (freq, time) transpose at the edge.
    """
    frames = frame_signal(x, n_fft, hop_length, center=center, pad_mode=pad_mode)
    cos_b, sin_b = _dft_bases(n_fft)
    cos_b = jnp.asarray(cos_b)
    sin_b = jnp.asarray(sin_b)
    re = jnp.matmul(frames, cos_b, precision=_HIGH)
    im = jnp.matmul(frames, sin_b, precision=_HIGH)
    spec = re * re + im * im
    if power == 2.0:
        return spec
    return jnp.power(spec, power / 2.0)
