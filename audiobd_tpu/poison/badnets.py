"""BadNets: feature-domain square-patch trigger.

Reference semantics (utils/badnet_trigger.py:4-27, badnets.py:38-95):
  * trigger = (1, frames, n_mfcc) zeros with the bottom-right ``size``²
    block set to −200 (the MFCC log-domain floor; SURVEY.md §6b.8) — i.e.
    the last time frames × the highest coefficients;
  * train: a random ``rate`` fraction of rows get the patch and label →
    target; test: every non-target-class row is patched, all labels → target.

TPU-first: the injection is one fused jnp.where over the whole (selected)
batch, not a per-sample loop (reference loops per clip, badnets.py:53-77).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from audiobd_tpu.configs import AttackConfig
from audiobd_tpu.data.speech_commands import CleanData
from audiobd_tpu.train.loop import ArraySet
from audiobd_tpu.utils import random as rnd


def generate_trigger(
    n_mfcc: int,
    frames: int,
    square_size: int,
    distance_to_right: int = 0,
    distance_to_bottom: int = 0,
    value: float = -200.0,
    save_path: str | None = "resources/BadNets/trigger.npy",
) -> np.ndarray:
    """Square patch at the bottom-right of the (1, frames, n_mfcc) feature map."""
    trig = np.zeros((1, frames, n_mfcc), dtype=np.float32)
    r0 = frames - distance_to_bottom - square_size
    r1 = frames - distance_to_bottom
    c0 = n_mfcc - distance_to_right - square_size
    c1 = n_mfcc - distance_to_right
    trig[:, r0:r1, c0:c1] = value
    if save_path:
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        np.save(save_path, trig)
    return trig


@jax.jit
def apply_trigger(mfcc: jax.Array, trigger: jax.Array) -> jax.Array:
    """Overwrite feature cells where the trigger is nonzero; batched."""
    return jnp.where(trigger != 0, trigger, mfcc)


def _poison_features(w, ind, trigger, params, use_pallas):
    if jnp.issubdtype(w.dtype, jnp.integer):
        # int16 PCM ingest path: wav data is natively int16, so callers can
        # ship PCM over the (bandwidth-bound) host link at half the bytes
        # and dequantize here — exact in f32 (matches data/wavio.py:24).
        # The 2^-15 full-scale is int16-specific; reject other widths loudly
        # rather than silently mis-scaling 24/32-bit PCM.
        assert w.dtype == jnp.int16, f"integer wavs must be int16 PCM, got {w.dtype}"
        w = w.astype(jnp.float32) * (1.0 / 32768.0)
    if use_pallas:
        from audiobd_tpu.ops.pallas_mfcc import fused_mfcc_features

        feats = fused_mfcc_features(w, params)
    else:
        from audiobd_tpu.dsp import mfcc_features

        feats = mfcc_features(w, params)
    patched = apply_trigger(feats, trigger)
    return jnp.where(ind[:, None, None, None] == 1, patched, feats)


@functools.partial(jax.jit, static_argnames=("params", "chunk", "use_pallas"))
def _poison_chunked(w, ind, trigger, params, chunk, use_pallas):
    """(K*chunk, T) → (K*chunk, 1, F, M): lax.map over chunk-sized blocks.

    One compiled program for the whole pass — the chunk loop lives INSIDE
    the jit (a ~31-dispatch host loop over the same math measured 4.5 s vs
    84 ms for this formulation on the tunnel-attached chip: per-dispatch
    round-trip latency dominates everything when the host drives the loop).
    ``chunk`` only bounds the live STFT intermediates (chunk × frames ×
    n_fft); 2048 and 4096 measure identically.
    """
    k = w.shape[0] // chunk
    wr = w.reshape(k, chunk, w.shape[-1])
    ir = ind.reshape(k, chunk)
    out = jax.lax.map(
        lambda args: _poison_features(args[0], args[1], trigger, params, use_pallas), (wr, ir)
    )
    return out.reshape(k * chunk, *out.shape[2:])


@functools.partial(jax.jit, static_argnames=("params", "use_pallas"))
def _poison_flat(w, ind, trigger, params, use_pallas):
    return _poison_features(w, ind, trigger, params, use_pallas)


def _host_wav_cast(wavs) -> np.ndarray:
    """Host wavs → transfer dtype: integer PCM ships as-is (half the bytes
    over the host link; dequantized on device), everything else as f32."""
    arr = np.asarray(wavs)
    return arr if np.issubdtype(arr.dtype, np.integer) else arr.astype(np.float32, copy=False)


def poison_waveforms_device(
    wavs, indicators, trigger, params, chunk: int = 2048, use_pallas: bool = False
) -> jax.Array:
    """Fused device-resident prep: waveforms → MFCC → BadNets patch.

    The reference's hot path recomputes MFCC per clip on the host and then
    patches in a second pass (badnets.py:38-108, prepare_dataset.py:49-84);
    here MFCC + patch + indicator-select run as ONE compiled program
    (lax.map over chunk-sized blocks — see _poison_chunked for why the loop
    must not be host-driven), and the poisoned features never leave the
    device — train/scan_epoch.DeviceDataset adopts the returned array with
    no host round trip. Inputs are wrap-padded to a chunk multiple so
    compiled shapes are quantized (pad rows carry indicator 0 and are
    sliced off lazily).

    wavs: (N, T) or (N, 1, T), host or device. indicators: (N,) ints
    (1 = poison). trigger: (1, frames, n_mfcc). Returns (N, 1, F, M) f32.
    """
    trigger = jnp.asarray(trigger)
    n = len(wavs)
    is_host = not isinstance(wavs, jax.Array)
    if use_pallas and jax.default_backend() == "cpu":
        use_pallas = False

    if n <= chunk:
        w = wavs if not is_host else jnp.asarray(_host_wav_cast(wavs))
        if w.ndim >= 3 and w.shape[-2] == 1:
            w = jnp.squeeze(w, -2)
        return _poison_flat(w, jnp.asarray(indicators, jnp.int32), trigger, params, use_pallas)

    pad = (-n) % chunk
    if is_host:
        w = _host_wav_cast(wavs)
        if w.ndim >= 3 and w.shape[-2] == 1:
            w = np.squeeze(w, -2)
        ind = np.asarray(indicators, np.int32)
        if pad:
            w = np.concatenate([w, w[:pad]])
            ind = np.concatenate([ind, np.zeros(pad, np.int32)])
        w = jnp.asarray(w)
        ind = jnp.asarray(ind)
    else:
        w = wavs
        if w.ndim >= 3 and w.shape[-2] == 1:
            w = jnp.squeeze(w, -2)
        ind = jnp.asarray(indicators, jnp.int32)
        if pad:
            w = jnp.concatenate([w, w[:pad]])
            ind = jnp.concatenate([ind, jnp.zeros(pad, jnp.int32)])
    out = _poison_chunked(w, ind, trigger, params, chunk, use_pallas)
    return out[:n] if pad else out


@dataclass
class PoisonedData:
    bd_train: ArraySet
    bd_test: ArraySet
    clean_test: ArraySet


def poison(cfg: AttackConfig, clean: CleanData, save: bool = True) -> PoisonedData:
    frames, n_mfcc = clean.train_mfcc.shape[-2], clean.train_mfcc.shape[-1]
    trig = generate_trigger(
        n_mfcc, frames, cfg.trigger_size,
        save_path=os.path.join(cfg.record_dir, "resources", "BadNets", "trigger.npy") if save else None,
    )
    trig_j = jnp.asarray(trig)

    n_train = len(clean.train_mfcc)
    rng = rnd.np_rng(cfg.train.seed, "badnets_poison")
    poison_idx = rng.choice(n_train, size=int(n_train * cfg.poisoning_rate), replace=False)

    bd_train_mfcc = clean.train_mfcc.copy()
    bd_train_mfcc[poison_idx] = np.asarray(apply_trigger(jnp.asarray(clean.train_mfcc[poison_idx]), trig_j))
    bd_train_label = clean.train_label.copy()
    bd_train_label[poison_idx] = cfg.target_label
    ind_train = np.zeros(n_train, dtype=np.int64)
    ind_train[poison_idx] = 1

    # Test: patch every non-target row; all labels flipped to the target
    # (reference badnets.py:66-77).
    nontarget = clean.test_label != cfg.target_label
    bd_test_mfcc = clean.test_mfcc.copy()
    bd_test_mfcc[nontarget] = np.asarray(apply_trigger(jnp.asarray(clean.test_mfcc[nontarget]), trig_j))
    bd_test_label = np.full(len(clean.test_label), cfg.target_label, dtype=np.int64)
    ind_test = nontarget.astype(np.int64)

    if save:
        save_bd_arrays(
            cfg,
            bd_train_mfcc=bd_train_mfcc,
            bd_test_mfcc=bd_test_mfcc,
            bd_train_label=bd_train_label,
            bd_test_label=bd_test_label,
            poison_index_train=ind_train,
            poison_index_test=ind_test,
        )

    return PoisonedData(
        bd_train=ArraySet(bd_train_mfcc, bd_train_label, ind_train),
        bd_test=ArraySet(bd_test_mfcc, bd_test_label, ind_test),
        clean_test=ArraySet(clean.test_mfcc, clean.test_label),
    )


def bd_dir(cfg: AttackConfig) -> str:
    return os.path.join(cfg.record_dir, cfg.dataset, "bd")


def save_bd_arrays(cfg: AttackConfig, **arrays: np.ndarray) -> None:
    path = bd_dir(cfg)
    os.makedirs(path, exist_ok=True)
    for name, arr in arrays.items():
        np.save(os.path.join(path, name + ".npy"), arr)
