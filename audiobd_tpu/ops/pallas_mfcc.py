"""Fused Pallas MFCC kernel.

One kernel computes the whole waveform→MFCC pipeline for a block of clips
without spilling intermediates to HBM:

    VMEM: chunked clips → shifted partial DFT products → power → @ mel fb →
    per-clip top_db log → @ DCT → MFCC out

Frame extraction is *folded into the DFT matmul* instead of materialized:
with q = ceil(n_fft/hop), frame f spans hop-chunks f … f+q−1, so

    re[f] = Σ_j C[f+j] @ Bc[j·hop : (j+1)·hop]

— q matmuls of the chunk matrix against the split bases plus
statically-shifted adds. This avoids the Mosaic restriction on unaligned
dynamic lane slices (hop=160/441/512 are not 128-aligned) *and* never
builds the 2.5×-redundant im2col frame matrix the XLA path gathers.

All contractions run on the MXU; numerics match dsp.mfcc to fp32 roundoff
(asserted in interpret mode by tests and on-device in bench).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audiobd_tpu.dsp.mel import dct_matrix, mel_filterbank
from audiobd_tpu.dsp.mfcc import MFCCParams
from audiobd_tpu.dsp.stft import _dft_bases


def _stacked_bases(n_fft: int, hop: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Windowed DFT bases cut into q = ceil(n_fft/hop) hop-row blocks,
    zero-padded to hop rows: (q, hop, n_bins) each for cos and sin."""
    cos_b, sin_b = _dft_bases(n_fft)  # (n_fft, n_bins)
    q = -(-n_fft // hop)  # number of hop-chunks a frame spans (ceil)
    n_bins = cos_b.shape[1]
    out_c = np.zeros((q, hop, n_bins), np.float32)
    out_s = np.zeros((q, hop, n_bins), np.float32)
    for j in range(q):
        rows = cos_b[j * hop : (j + 1) * hop]
        out_c[j, : rows.shape[0]] = rows
        out_s[j, : rows.shape[0]] = sin_b[j * hop : (j + 1) * hop]
    return out_c, out_s, q  # (q, hop, n_bins) each


def _kernel(x_ref, cos_ref, sin_ref, mel_ref, dct_ref, out_ref,
            *, n_frames: int, n_chunks: int, hop: int, q: int, n_bins: int,
            block: int, top_db: float | None):
    chunks = x_ref[:].reshape(block * n_chunks, hop)

    # q matmuls → partial products per chunk position; frame f sums partial
    # j at chunk f+j (static sublane shifts only — lane dim stays n_bins).
    re = None
    im = None
    for j in range(q):
        pc = jnp.dot(chunks, cos_ref[j], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        ps = jnp.dot(chunks, sin_ref[j], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        pc = pc.reshape(block, n_chunks, n_bins)[:, j : j + n_frames, :]
        ps = ps.reshape(block, n_chunks, n_bins)[:, j : j + n_frames, :]
        re = pc if re is None else re + pc
        im = ps if im is None else im + ps

    power = (re * re + im * im).reshape(block * n_frames, n_bins)
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)

    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    if top_db is not None:
        per_clip = db.reshape(block, n_frames * db.shape[-1])
        clip_max = jnp.max(per_clip, axis=1, keepdims=True)
        floor = (clip_max - top_db).reshape(block, 1, 1)
        db = jnp.maximum(db.reshape(block, n_frames, -1), floor).reshape(block * n_frames, -1)

    mfcc = jnp.dot(db, dct_ref[:], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    out_ref[:] = mfcc.reshape(block, n_frames, -1)


def fused_mfcc(
    wavs: jax.Array,
    params: MFCCParams,
    block: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """(B, T) → (B, n_frames, n_mfcc), equivalent to dsp.mfcc(wavs, params)."""
    assert wavs.ndim == 2, "fused_mfcc expects (B, T)"
    b, t = wavs.shape
    n_fft, hop = params.n_fft, params.hop_length
    pad = n_fft // 2
    n_frames = 1 + (t + 2 * pad - n_fft) // hop
    n_bins = n_fft // 2 + 1

    if b % block != 0:
        reps = (-b) % block
        wavs = jnp.concatenate([wavs, wavs[:1].repeat(reps, 0)], axis=0)
    bb = wavs.shape[0]

    mode = "reflect" if params.pad_mode == "reflect" else "constant"
    padded = jnp.pad(wavs, ((0, 0), (pad, pad)), mode=mode)

    cos_s, sin_s, q = _stacked_bases(n_fft, hop)
    # Chunk the padded clips; ensure chunks ≥ n_frames + q so every shifted
    # read is in bounds (extra chunks are zero).
    n_chunks = max(-(-padded.shape[-1] // hop), n_frames + q)
    tail = n_chunks * hop - padded.shape[-1]
    if tail:
        padded = jnp.pad(padded, ((0, 0), (0, tail)))
    chunked = padded.reshape(bb, n_chunks, hop)

    mel_fb = mel_filterbank(
        params.sample_rate, n_fft, n_mels=params.n_mels,
        scale=params.mel_scale, norm=params.mel_norm,
    )
    dct = dct_matrix(params.n_mfcc, params.n_mels, norm="ortho")

    kernel = functools.partial(
        _kernel, n_frames=n_frames, n_chunks=n_chunks, hop=hop, q=q,
        n_bins=n_bins, block=block, top_db=params.top_db,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bb, n_frames, params.n_mfcc), jnp.float32),
        grid=(bb // block,),
        in_specs=[
            pl.BlockSpec((block, n_chunks, hop), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, hop, n_bins), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, hop, n_bins), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, params.n_mels), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((params.n_mels, params.n_mfcc), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block, n_frames, params.n_mfcc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(chunked, jnp.asarray(cos_s), jnp.asarray(sin_s), jnp.asarray(mel_fb), jnp.asarray(dct))
    return out[:b]


def fused_mfcc_features(wavs: jax.Array, params: MFCCParams, **kw) -> jax.Array:
    """(B, T) or (B, 1, T) → (B, 1, frames, n_mfcc) — drop-in for
    dsp.mfcc_features on the hot path."""
    if wavs.ndim == 3 and wavs.shape[-2] == 1:
        wavs = jnp.squeeze(wavs, -2)
    out = fused_mfcc(wavs, params, **kw)
    return out[:, None, :, :]
