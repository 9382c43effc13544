"""Polyphase sinc resampling (torchaudio `sinc_interp_hann` semantics).

The reference resamples every clip on the host CPU, one file at a time
(torchaudio.functional.resample inside the per-wav loop,
prepare_dataset.py:60). Here resampling is a single strided conv1d with a
precomputed polyphase kernel bank — one batched XLA conv per dataset shard,
which the TPU executes on the MXU.

Algorithm: windowed-sinc lowpass at ``rolloff * min(orig, new)/2`` Hz,
evaluated at the ``new`` output phases per ``orig`` input samples
(the standard polyphase decomposition torchaudio implements).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _kernel(orig: int, new: int, lowpass_filter_width: int, rolloff: float) -> tuple[np.ndarray, int]:
    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)
    # For output phase p (0..new-1), taps cover input samples [-width, width + orig).
    idx = np.arange(-width, width + orig, dtype=np.float64)[None, :] / orig
    t = (-np.arange(new, dtype=np.float64)[:, None] / new + idx) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2.0) ** 2
    t = t * np.pi
    kernel = np.where(t == 0.0, 1.0, np.sin(t) / np.where(t == 0.0, 1.0, t))
    kernel = kernel * window * base_freq / orig
    return kernel.astype(np.float32), width


def resample(
    x: jax.Array,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jax.Array:
    """Resample ``x`` (..., T) from orig_freq to new_freq."""
    g = math.gcd(int(orig_freq), int(new_freq))
    orig, new = int(orig_freq) // g, int(new_freq) // g
    if orig == new:
        return x

    kernel_np, width = _kernel(orig, new, lowpass_filter_width, rolloff)
    t_in = x.shape[-1]
    target_length = math.ceil(new * t_in / orig)

    lead_shape = x.shape[:-1]
    xb = x.reshape((-1, 1, t_in))
    xb = jnp.pad(xb, ((0, 0), (0, 0), (width, width + orig)))
    kern = jnp.asarray(kernel_np)[:, None, :]  # (new, 1, K)
    out = jax.lax.conv_general_dilated(
        xb,
        kern,
        window_strides=(orig,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (B, new, frames)
    out = jnp.transpose(out, (0, 2, 1)).reshape((xb.shape[0], -1))[:, :target_length]
    return out.reshape(lead_shape + (target_length,))
