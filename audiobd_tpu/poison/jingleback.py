"""JingleBack: stylistic audio-effect triggers.

The six style chains (reference utils/styles_trigger.py:8-53):
  0  PitchShift(+10 semitones)
  1  Distortion(30 dB)
  2  Chorus(1 Hz, depth 5, centre 10 ms, feedback 0, mix 0.5)
  3  PitchShift(10) → Distortion(20) → Chorus(1 Hz, 5, 8 ms)
  4  Chorus(centre 15 ms, defaults) → Distortion(20) → Reverb(room 0.6)
  5  Gain(12 dB) → LadderFilter(HPF12 @ 1 kHz) → Phaser(defaults)

Poisoning (reference jingleback.py:38-119): sampled train rows are restyled
and re-MFCC'd with label → target; every non-target test row restyled.
"""

from __future__ import annotations

from dataclasses import dataclass


import jax
import jax.numpy as jnp
import numpy as np

from audiobd_tpu.configs import AttackConfig
from audiobd_tpu.data.speech_commands import CleanData, mfcc_params
from audiobd_tpu.poison import effects as fx
from audiobd_tpu.poison.badnets import save_bd_arrays
from audiobd_tpu.train.loop import ArraySet
from audiobd_tpu.utils import random as rnd


def get_boards(sample_rate: int = 16000):
    """Style id → callable (B, T) → (B, T)."""

    def style0(x):
        return fx.pitch_shift(x, sample_rate, 10.0)

    def style1(x):
        return fx.distortion(x, 30.0)

    def style2(x):
        return fx.chorus(x, sample_rate, rate_hz=1.0, depth=5.0, centre_delay_ms=10.0, mix=0.5)

    def style3(x):
        x = fx.pitch_shift(x, sample_rate, 10.0)
        x = fx.distortion(x, 20.0)
        return fx.chorus(x, sample_rate, rate_hz=1.0, depth=5.0, centre_delay_ms=8.0, mix=0.5)

    def style4(x):
        x = fx.chorus(x, sample_rate, centre_delay_ms=15.0)
        x = fx.distortion(x, 20.0)
        return fx.reverb(x, sample_rate, room_size=0.6)

    def style5(x):
        x = fx.gain(x, 12.0)
        x = fx.ladder_hpf12(x, sample_rate, cutoff_hz=1000.0)
        return fx.phaser(x, sample_rate)

    return [style0, style1, style2, style3, style4, style5]


def poison_style_device(
    wavs: np.ndarray, style: int, sample_rate: int, chunk: int = 256
) -> jax.Array:
    """Apply style ``style`` to (N, 1, T) waveforms → (N, T) DEVICE-resident.

    Chunks are dispatched without intermediate host fetches (a per-chunk
    np.asarray serializes the effect chain with tunnel transfers); the
    result stays on device for the MFCC stage / one host fetch for the
    wav npy contract.
    """
    board = get_boards(sample_rate)[style]
    fn = jax.jit(board)
    outs = []
    flat = wavs[:, 0, :].astype(np.float32)
    n = len(flat)
    for start in range(0, n, chunk):
        block = flat[start : start + chunk]
        pad = 0
        if len(block) < chunk and n > chunk:
            pad = chunk - len(block)
            block = np.concatenate([block, block[:1].repeat(pad, axis=0)])
        out = fn(jnp.asarray(block))
        outs.append(out[: out.shape[0] - pad] if pad else out)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def poison_style(wavs: np.ndarray, style: int, sample_rate: int, chunk: int = 256) -> np.ndarray:
    """Host-output wrapper of poison_style_device."""
    return np.asarray(poison_style_device(wavs, style, sample_rate, chunk))[:, None, :]


@dataclass
class JingleBackPoisoned:
    bd_train: ArraySet
    bd_test: ArraySet
    clean_test: ArraySet


def _poison_split(clean_wav, clean_mfcc, clean_mfcc_dev, idx, style, sr, params, use_pallas):
    """Device-resident subset restyling for one split: styled waveforms stay
    on device through the MFCC stage (one host fetch each for the wav/mfcc
    npy contracts), and the styled rows are merged into the device-resident
    clean features with one compiled scatter. Returns
    (bd_wav_host, bd_mfcc_host, bd_mfcc_dev)."""
    from audiobd_tpu.data.speech_commands import batched_mfcc_device
    from audiobd_tpu.poison import device_prep

    bd_wav = clean_wav.copy()
    bd_mfcc_host = clean_mfcc.copy()
    feats_dev = clean_mfcc_dev if clean_mfcc_dev is not None else jnp.asarray(clean_mfcc)
    if len(idx) == 0:
        return bd_wav, bd_mfcc_host, feats_dev
    styled_dev = poison_style_device(clean_wav[idx], style, sr)  # (k, T) device
    sub_feats = batched_mfcc_device(styled_dev, params, use_pallas=use_pallas)
    bd_mfcc_dev = device_prep.scatter_rows(feats_dev, sub_feats, jnp.asarray(idx))
    bd_wav[idx] = np.asarray(styled_dev)[:, None, :]
    bd_mfcc_host[idx] = np.asarray(sub_feats)
    return bd_wav, bd_mfcc_host, bd_mfcc_dev


def poison(cfg: AttackConfig, clean: CleanData, save: bool = True) -> JingleBackPoisoned:
    params = mfcc_params(cfg)
    sr = cfg.dsp.sample_rate
    n_train = len(clean.train_wav)
    rng = rnd.np_rng(cfg.train.seed, "jingleback_poison")
    poison_idx = rng.choice(n_train, size=int(n_train * cfg.poisoning_rate), replace=False)

    bd_train_wav, bd_train_mfcc, bd_train_mfcc_dev = _poison_split(
        clean.train_wav, clean.train_mfcc, clean.train_mfcc_dev,
        poison_idx, cfg.style, sr, params, cfg.dsp.use_pallas,
    )
    bd_train_label = clean.train_label.copy()
    bd_train_label[poison_idx] = cfg.target_label
    ind_train = np.zeros(n_train, dtype=np.int64)
    ind_train[poison_idx] = 1

    nontarget = clean.test_label != cfg.target_label
    bd_test_wav, bd_test_mfcc, bd_test_mfcc_dev = _poison_split(
        clean.test_wav, clean.test_mfcc, clean.test_mfcc_dev,
        np.flatnonzero(nontarget), cfg.style, sr, params, cfg.dsp.use_pallas,
    )
    bd_test_label = np.full(len(clean.test_label), cfg.target_label, dtype=np.int64)
    ind_test = nontarget.astype(np.int64)

    if save:
        save_bd_arrays(
            cfg,
            bd_train_wav=bd_train_wav,
            bd_test_wav=bd_test_wav,
            bd_train_mfcc=bd_train_mfcc,
            bd_test_mfcc=bd_test_mfcc,
            bd_train_label=bd_train_label,
            bd_test_label=bd_test_label,
            poison_index_train=ind_train,
            poison_index_test=ind_test,
        )
    return JingleBackPoisoned(
        bd_train=ArraySet(bd_train_mfcc_dev, bd_train_label, ind_train),
        bd_test=ArraySet(bd_test_mfcc_dev, bd_test_label, ind_test),
        clean_test=ArraySet(
            clean.test_mfcc_dev if clean.test_mfcc_dev is not None else clean.test_mfcc,
            clean.test_label,
        ),
    )
