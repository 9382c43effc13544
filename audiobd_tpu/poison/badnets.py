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
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from audiobd_tpu.configs import AttackConfig
from audiobd_tpu.data.speech_commands import CleanData
from audiobd_tpu.poison import device_prep
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


def _block(w, ind, trigger, params, use_pallas):
    return device_prep.make_block_fn(
        params, feat_fn=lambda f: apply_trigger(f, trigger), use_pallas=use_pallas
    )(w, ind)


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
    return device_prep.map_blocks(
        lambda wb, ib: _block(wb, ib, trigger, params, use_pallas), w, ind, chunk
    )


@functools.partial(jax.jit, static_argnames=("params", "use_pallas"))
def _poison_flat(w, ind, trigger, params, use_pallas):
    return _block(w, ind, trigger, params, use_pallas)


def poison_waveforms_device(
    wavs, indicators, trigger, params, chunk: int = 2048, use_pallas: bool = False
) -> jax.Array:
    """Fused device-resident prep: waveforms → MFCC → BadNets patch.

    The reference's hot path recomputes MFCC per clip on the host and then
    patches in a second pass (badnets.py:38-108, prepare_dataset.py:49-84);
    here dequantize + MFCC + patch + indicator-select run as ONE compiled
    program (lax.map over chunk-sized blocks — see _poison_chunked for why
    the loop must not be host-driven), and the poisoned features never
    leave the device — train/scan_epoch.DeviceDataset adopts the returned
    array with no host round trip. Inputs are wrap-padded to quantized
    bucket sizes (device_prep.padded_size) so repeated calls at any N reuse
    compiled programs; pad rows carry indicator 0 and are sliced off.

    This is the same program family data/speech_commands.py's first-run
    ingest and the e2e bench execute (poison/device_prep.py is the single
    implementation).

    wavs: (N, T) or (N, 1, T), host or device, f32 or int16 PCM.
    indicators: (N,) ints (1 = poison). trigger: (1, frames, n_mfcc).
    Returns (N, 1, F, M) f32.
    """
    trigger = jnp.asarray(trigger)
    if use_pallas and jax.default_backend() == "cpu":
        use_pallas = False
    return device_prep.run_prep(
        lambda w, i: _poison_flat(w, i, trigger, params, use_pallas),
        lambda w, i: _poison_chunked(w, i, trigger, params, chunk, use_pallas),
        wavs, indicators, chunk,
    )


@dataclass
class PoisonedData:
    bd_train: ArraySet
    bd_test: ArraySet
    clean_test: ArraySet


@jax.jit
def _patch_indicated(feats: jax.Array, ind: jax.Array, trigger: jax.Array) -> jax.Array:
    """Patch indicator==1 rows; one program over the whole split."""
    return jnp.where(ind[:, None, None, None] == 1, apply_trigger(feats, trigger), feats)


def poison(cfg: AttackConfig, clean: CleanData, save: bool = True) -> PoisonedData:
    """Build the poisoned splits DEVICE-RESIDENT (the production prep path).

    Clean features go to the device once (zero-copy when prepare_clean_dataset
    just computed them there — CleanData.train_mfcc_dev) and are patched in
    one compiled program per split; train/scan_epoch.DeviceDataset then
    adopts the arrays with no host round trip. The record/ npy contract
    (reference badnets.py:78-95) is written from the device arrays once.
    """
    frames, n_mfcc = clean.train_mfcc.shape[-2], clean.train_mfcc.shape[-1]
    trig = generate_trigger(
        n_mfcc, frames, cfg.trigger_size,
        save_path=os.path.join(cfg.record_dir, "resources", "BadNets", "trigger.npy") if save else None,
    )
    trig_j = jnp.asarray(trig)

    n_train = len(clean.train_mfcc)
    rng = rnd.np_rng(cfg.train.seed, "badnets_poison")
    poison_idx = rng.choice(n_train, size=int(n_train * cfg.poisoning_rate), replace=False)

    ind_train = np.zeros(n_train, dtype=np.int64)
    ind_train[poison_idx] = 1
    bd_train_label = clean.train_label.copy()
    bd_train_label[poison_idx] = cfg.target_label

    # Test: patch every non-target row; all labels flipped to the target
    # (reference badnets.py:66-77).
    nontarget = clean.test_label != cfg.target_label
    ind_test = nontarget.astype(np.int64)
    bd_test_label = np.full(len(clean.test_label), cfg.target_label, dtype=np.int64)

    t0 = time.perf_counter()
    feats_train = clean.train_mfcc_dev if clean.train_mfcc_dev is not None else jnp.asarray(clean.train_mfcc)
    feats_test = clean.test_mfcc_dev if clean.test_mfcc_dev is not None else jnp.asarray(clean.test_mfcc)
    bd_train_mfcc = _patch_indicated(feats_train, jnp.asarray(ind_train, jnp.int32), trig_j)
    bd_test_mfcc = _patch_indicated(feats_test, jnp.asarray(ind_test, jnp.int32), trig_j)
    jax.device_get(bd_test_mfcc[-1, :1, :1, :1])  # force (block_until_ready lies on axon)
    n_prep = n_train + len(clean.test_label)
    dt = time.perf_counter() - t0
    print(f"badnets prep (device-resident patch): {n_prep} clips in {dt:.3f} s "
          f"({n_prep / max(dt, 1e-9):.0f} clips/s)")

    if save:
        save_bd_arrays(
            cfg,
            bd_train_mfcc=np.asarray(bd_train_mfcc),
            bd_test_mfcc=np.asarray(bd_test_mfcc),
            bd_train_label=bd_train_label,
            bd_test_label=bd_test_label,
            poison_index_train=ind_train,
            poison_index_test=ind_test,
        )

    return PoisonedData(
        bd_train=ArraySet(bd_train_mfcc, bd_train_label, ind_train),
        bd_test=ArraySet(bd_test_mfcc, bd_test_label, ind_test),
        clean_test=ArraySet(
            clean.test_mfcc_dev if clean.test_mfcc_dev is not None else clean.test_mfcc,
            clean.test_label,
        ),
    )


def bd_dir(cfg: AttackConfig) -> str:
    return os.path.join(cfg.record_dir, cfg.dataset, "bd")


def save_bd_arrays(cfg: AttackConfig, **arrays: np.ndarray) -> None:
    path = bd_dir(cfg)
    os.makedirs(path, exist_ok=True)
    for name, arr in arrays.items():
        np.save(os.path.join(path, name + ".npy"), arr)
