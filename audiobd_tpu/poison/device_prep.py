"""Fused device-resident poisoning prep shared by the attack entries.

The reference prepares poisoned datasets with per-clip host loops
(prepare_dataset.py:49-84 plus each attack's injection loop, e.g.
badnets.py:38-77, ultrasonic.py:60-96). Here the whole pass —
(dequantize int16 PCM) → [waveform injection] → MFCC → [feature injection]
→ indicator select — is ONE compiled program:

  * ``lax.map`` over chunk-sized blocks INSIDE the jit. A host-driven chunk
    loop pays a dispatch round trip per chunk over the tunneled backend
    (measured 4.5 s vs 84 ms for the same math, round 3); ``chunk`` only
    bounds the live STFT intermediates.
  * int16 PCM is accepted and dequantized on device — callers can ship raw
    PCM over the bandwidth-bound host link at half the bytes
    (data/wavio.py:24 scaling, exact in f32).
  * inputs are wrap-padded to quantized bucket sizes (powers of two up to
    ``chunk``, then chunk multiples) so repeated small-N calls reuse
    compiled programs via the persistent compile cache instead of paying a
    fresh ~20-60 s tunnel compile per distinct dataset size.

poison/badnets.py builds its fused prep from ``make_block_fn``/``map_blocks``
/``run_prep`` with module-level jitted wrappers (its trigger is a traced
argument — the bench-hot path must reuse one executable). The subset attacks
(ultrasonic/jingleback/flowmur/daba) recompute only their injected rows'
MFCCs and merge them into the device-resident clean features with
``scatter_rows``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MIN_BUCKET = 256


def dequantize_pcm(w: jax.Array) -> jax.Array:
    """int16 PCM → f32 in [-1, 1); exact (2⁻¹⁵ is a power of two, matching
    both data/wavio.py:24 and native/wav_decoder.cpp:109 bit-for-bit).

    Trace-time ValueError on other integer widths: a bare assert would be
    stripped under ``python -O`` and 24/32-bit PCM would silently come out
    2⁹/2¹⁷ too large.
    """
    if jnp.issubdtype(w.dtype, jnp.integer):
        if w.dtype != jnp.int16:
            raise ValueError(f"integer wavs must be int16 PCM, got {w.dtype}")
        w = w.astype(jnp.float32) * (1.0 / 32768.0)
    return w


def make_block_fn(params, *, feat_fn=None, use_pallas: bool = False):
    """Build the (chunk, T) wavs + (chunk,) indicators → (chunk, 1, F, M) body.

    ``feat_fn``: feature-domain injection applied to indicator==1 rows after
    MFCC (BadNets' patch); may close over device arrays or tracers.
    """

    def block(w, ind):
        w = dequantize_pcm(w)
        if use_pallas:
            from audiobd_tpu.ops.pallas_mfcc import fused_mfcc_features

            feats = fused_mfcc_features(w, params)
        else:
            from audiobd_tpu.dsp import mfcc_features

            feats = mfcc_features(w, params)
        if feat_fn is not None:
            feats = jnp.where(ind[:, None, None, None] == 1, feat_fn(feats), feats)
        return feats

    return block


def map_blocks(block, w, ind, chunk: int):
    """lax.map ``block`` over chunk-sized row blocks (trace-time helper;
    ``w.shape[0]`` must be a chunk multiple — run_prep guarantees it)."""
    k = w.shape[0] // chunk
    wr = w.reshape(k, chunk, w.shape[-1])
    ir = ind.reshape(k, chunk)
    out = jax.lax.map(lambda args: block(args[0], args[1]), (wr, ir))
    return out.reshape(k * chunk, *out.shape[2:])


def padded_size(n: int, chunk: int) -> int:
    """Quantize compiled shapes: small inputs wrap-pad up to the next power
    of two (min MIN_BUCKET, capped at ``chunk``); larger ones to a chunk
    multiple."""
    if n <= chunk:
        b = MIN_BUCKET
        while b < n:
            b *= 2
        return min(b, chunk)
    return -(-n // chunk) * chunk


def host_wav_cast(wavs) -> np.ndarray:
    """Host wavs → transfer dtype: integer PCM ships as-is (half the bytes
    over the host link; dequantized on device), everything else as f32."""
    arr = np.asarray(wavs)
    return arr if np.issubdtype(arr.dtype, np.integer) else arr.astype(np.float32, copy=False)


def run_prep(flat_fn, chunked_fn, wavs, indicators, chunk: int) -> jax.Array:
    """Shared host-cast / wrap-pad / dispatch for the fused prep programs.

    ``flat_fn(w, ind)`` serves bucket-sized inputs (≤ chunk rows);
    ``chunked_fn(w, ind)`` serves chunk-multiple inputs. Pad rows wrap
    existing rows with indicator 0 and are sliced off afterwards.
    """
    n = len(wavs)
    is_host = not isinstance(wavs, jax.Array)
    target = padded_size(n, chunk)
    pad = target - n
    if is_host:
        w = host_wav_cast(wavs)
        if w.ndim >= 3 and w.shape[-2] == 1:
            w = np.squeeze(w, -2)
        ind = np.asarray(indicators, np.int32)
        if pad:
            idx = np.arange(pad) % n
            w = np.concatenate([w, w[idx]])
            ind = np.concatenate([ind, np.zeros(pad, np.int32)])
        w = jnp.asarray(w)
        ind = jnp.asarray(ind)
    else:
        w = wavs
        if w.ndim >= 3 and w.shape[-2] == 1:
            w = jnp.squeeze(w, -2)
        ind = jnp.asarray(indicators, jnp.int32)
        if pad:
            idx = jnp.arange(pad) % n
            w = jnp.concatenate([w, jnp.take(w, idx, axis=0)])
            ind = jnp.concatenate([ind, jnp.zeros(pad, jnp.int32)])
    out = flat_fn(w, ind) if target <= chunk else chunked_fn(w, ind)
    return out[:n] if pad else out


def make_sharded_prep_fn(block, mesh, chunk: int):
    """shard_map the fused prep over the mesh's 'data' axis.

    The prep is row-parallel (each clip's dequantize→inject→MFCC is
    independent), so the multi-chip layout is pure row sharding: every
    device runs the same ``map_blocks`` scan over its local rows and the
    output stays row-sharded for ShardedDeviceDataset adoption — no
    collectives at all. Caller contract: ``w.shape[0]`` divisible by the
    mesh's data axis, and each per-device shard a multiple of ``chunk``
    (run_prep's wrap-pad quantization provides this at production sizes).
    Validated against the single-device program by ``dryrun_multichip``
    phase 3.
    """
    from jax.sharding import PartitionSpec as P

    def local(w, ind):
        return map_blocks(block, w, ind, chunk)

    return jax.jit(
        jax.shard_map(
            local, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P("data")
        )
    )


@jax.jit
def scatter_rows(base: jax.Array, rows: jax.Array, idx: jax.Array) -> jax.Array:
    """``base`` with ``base[idx] ← rows`` as ONE compiled scatter.

    Subset-poisoning attacks (ultrasonic/jingleback/flowmur) recompute MFCCs
    only for the injected rows and merge them into the (device-resident)
    clean features here — the index shape is fixed for a given run, so the
    persistent cache holds exactly one entry per (dataset, rate) instead of
    the per-shape eager-scatter compiles that bit FP pruning in round 3.
    """
    return base.at[idx].set(rows)


