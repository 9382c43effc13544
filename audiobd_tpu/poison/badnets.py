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


def poison_waveforms_device(
    wavs, indicators, trigger, params, chunk: int = 2048, use_pallas: bool = False
) -> jax.Array:
    """Fused device-resident prep: waveforms → MFCC → BadNets patch.

    The reference's hot path recomputes MFCC per clip on the host and then
    patches in a second pass (badnets.py:38-108, prepare_dataset.py:49-84);
    here MFCC + patch + indicator-select run as ONE compiled program per
    chunk, all chunks dispatched before anything waits, and the poisoned
    features never leave the device — train/scan_epoch.DeviceDataset adopts
    the returned array with no host round trip.

    wavs: (N, T) or (N, 1, T), host or device. indicators: (N,) ints
    (1 = poison). trigger: (1, frames, n_mfcc). Returns (N, 1, F, M) f32.
    """
    from audiobd_tpu.dsp import mfcc_features

    trigger = jnp.asarray(trigger)

    if use_pallas and jax.default_backend() not in ("cpu",):
        from audiobd_tpu.ops.pallas_mfcc import fused_mfcc_features

        def features(w):
            if w.ndim >= 3 and w.shape[-2] == 1:
                w = jnp.squeeze(w, -2)
            return fused_mfcc_features(w, params)
    else:
        def features(w):
            return mfcc_features(w, params)

    @jax.jit
    def one(w, ind):
        feats = features(w)
        patched = apply_trigger(feats, trigger)
        return jnp.where(ind[:, None, None, None] == 1, patched, feats)

    n = len(wavs)
    wavs = jnp.asarray(wavs, jnp.float32) if not isinstance(wavs, jax.Array) else wavs
    indicators = jnp.asarray(indicators, jnp.int32)
    outs = []
    for start in range(0, n, chunk):
        block = wavs[start : start + chunk]
        ind = indicators[start : start + chunk]
        pad = 0
        if block.shape[0] < chunk and n > chunk:
            pad = chunk - block.shape[0]  # keep one compiled shape
            block = jnp.concatenate([block, jnp.broadcast_to(block[:1], (pad,) + block.shape[1:])])
            ind = jnp.concatenate([ind, jnp.zeros((pad,), ind.dtype)])
        out = one(block, ind)
        outs.append(out[: out.shape[0] - pad] if pad else out)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


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
