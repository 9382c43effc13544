"""Fused Pallas MFCC vs the XLA reference path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from audiobd_tpu.dsp import MFCCParams, mfcc
from audiobd_tpu.ops.pallas_mfcc import fused_mfcc


@pytest.mark.parametrize(
    "sr,n_mfcc,n_fft,hop",
    [(16000, 40, 400, 160), (16000, 13, 2048, 512)],
)
def test_fused_matches_reference(rng, sr, n_mfcc, n_fft, hop):
    params = MFCCParams(sample_rate=sr, n_mfcc=n_mfcc, n_fft=n_fft, hop_length=hop)
    x = jnp.asarray((rng.standard_normal((4, sr)) * 0.1).astype(np.float32))
    ref = np.asarray(mfcc(x, params))
    out = np.asarray(fused_mfcc(x, params, block=2, interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3)


def test_fused_handles_ragged_batch(rng):
    params = MFCCParams()
    x = jnp.asarray((rng.standard_normal((3, 16000)) * 0.1).astype(np.float32))
    out = np.asarray(fused_mfcc(x, params, block=2, interpret=True))
    ref = np.asarray(mfcc(x, params))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3)


def test_fused_librosa_mode(rng):
    params = MFCCParams(n_fft=2048, hop_length=512, parity="librosa")
    x = jnp.asarray((rng.standard_normal((2, 16000)) * 0.1).astype(np.float32))
    out = np.asarray(fused_mfcc(x, params, block=2, interpret=True))
    ref = np.asarray(mfcc(x, params))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3)
