"""Ultrasonic attack: inaudible (>20 kHz) additive waveform trigger.

Reference semantics (utils/ultra_trigger.py:8-111, ultrasonic.py:40-124):
  * a 1 s 44.1 kHz trigger waveform whose energy sits above 20 kHz;
  * a mask keeps ``size`` percent of the second — contiguous at
    start/mid/end, or split into 5 evenly-spaced chunks;
  * ``TriggerInfeasible`` on size ∉ (0, 100] or bad position;
  * train: sampled rows get ``wav + trigger`` then re-MFCC, label → target;
    test: every non-target row.

The reference ships a trigger wav asset; this framework synthesizes an
equivalent one (21–22 kHz band) on first use — or loads a user-provided
``resources/Ultrasonic/trigger.wav`` — so the attack is self-contained.

TPU-first: only the injected rows' MFCCs are recomputed (batched, on
device) and merged into the device-resident clean features with one
compiled scatter — training adopts the result with no host round trip
(the reference re-extracts per clip on host, ultrasonic.py:60-96).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from audiobd_tpu.configs import AttackConfig
from audiobd_tpu.data.speech_commands import CleanData, mfcc_params
from audiobd_tpu.data.wavio import read_wav, write_wav
from audiobd_tpu.poison.badnets import save_bd_arrays
from audiobd_tpu.train.loop import ArraySet
from audiobd_tpu.utils import random as rnd

TRIGGER_SR = 44100
DIVIDER = 100


class TriggerInfeasible(Exception):
    """Raised for invalid trigger size/position parameters.

    Quirk parity: the reference's message reports the size bound as 60
    (``correct_size`` at utils/ultra_trigger.py:12) while validation accepts
    (0, 100]; both behaviors are mirrored here.
    """

    correct_pos = ("start", "mid", "end")
    correct_size = 60  # message text only; validation uses DIVIDER (=100)

    def __init__(self, size, pos):
        self.size = size
        self.pos = pos
        super().__init__(
            f"Cannot apply trigger (size: {size}, pos: {pos}). Size should be in "
            f"(0, {self.correct_size}] and pos should be in {list(self.correct_pos)}"
        )


def synthesize_trigger_wave(path: str | None = None, seed: int = 7) -> np.ndarray:
    """1 s mono 44.1 kHz waveform with tones at 21.0–21.7 kHz (100 Hz steps),
    all above the 20 kHz audibility threshold the attack relies on."""
    rng = np.random.default_rng(seed)
    t = np.arange(TRIGGER_SR) / TRIGGER_SR
    wav = np.zeros(TRIGGER_SR, dtype=np.float64)
    # Integer frequencies are exactly bin-centered for a 1 s clip (1 Hz bins)
    # — no spectral leakage below 20 kHz.
    for f in range(21000, 21800, 100):
        wav += np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
    wav *= 0.25 / np.abs(wav).max()
    wav = wav.astype(np.float32)[None, :]  # (1, 44100)
    if path:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        write_wav(path, wav, TRIGGER_SR)
    return wav


class UltrasonicTrigger:
    """Masked ultrasonic trigger generator (reference GenerateTrigger)."""

    def __init__(
        self,
        size: int,
        pos: str,
        cont: bool = True,
        wave_path: str = "resources/Ultrasonic/trigger.wav",
        debug: bool = False,
        debug_dir: str = "resources/Ultrasonic/debug",
    ):
        self.debug = debug
        self.debug_dir = debug_dir
        if pos not in TriggerInfeasible.correct_pos:
            raise TriggerInfeasible(size, pos)
        if size <= 0 or size > DIVIDER:
            raise TriggerInfeasible(size, pos)
        if os.path.exists(wave_path):
            data, sr = read_wav(wave_path)
            assert sr == TRIGGER_SR, f"trigger wav must be {TRIGGER_SR} Hz"
            self.data = data[:1].astype(np.float32)
        else:
            self.data = synthesize_trigger_wave(wave_path)
        self.points = math.floor(self.data.shape[1] / DIVIDER) * size
        self.size = size
        self.pos = pos
        self.cont = cont

    def _mask_cont(self) -> np.ndarray:
        t = self.data.shape[1]
        if self.pos == "start":
            start, end = 0, self.points - 1
        elif self.pos == "mid":
            if self.points % 2 == 0:
                start = t // 2 - self.points // 2
            else:
                start = t // 2 - self.points // 2 + 1
            end = t // 2 + self.points // 2 - 1
        else:  # end
            start, end = t - self.points, t - 1
        keep = np.zeros(t, dtype=bool)
        keep[start : end + 1] = True
        return keep

    def _mask_non_cont(self) -> np.ndarray:
        t = self.data.shape[1]
        length = int(self.points / 5) - 1
        step = t // 5
        keep = np.zeros(t, dtype=bool)
        current = 0
        for _ in range(5):
            keep[current : current + length + 1] = True
            current += step
        return keep

    def trigger(self) -> np.ndarray:
        keep = self._mask_cont() if self.cont else self._mask_non_cont()
        out = np.where(keep[None, :], self.data, 0.0).astype(np.float32)
        if self.debug:
            # Debug plots as in the reference's GenerateTrigger(debug=True)
            # (utils/ultra_trigger.py:105-109).
            import os as _os

            import jax.numpy as jnp

            from audiobd_tpu.dsp import MFCCParams, mfcc
            from audiobd_tpu.utils.visual import plot_fft, plot_mfccs, plot_waveform

            _os.makedirs(self.debug_dir, exist_ok=True)
            plot_fft(out, TRIGGER_SR, _os.path.join(self.debug_dir, "trigger_fft.png"))
            plot_waveform(out, TRIGGER_SR, _os.path.join(self.debug_dir, "trigger_wave.png"))
            feats = mfcc(
                jnp.asarray(out[0]),
                MFCCParams(sample_rate=TRIGGER_SR, n_mfcc=40, n_fft=1103, hop_length=441),
            )
            plot_mfccs(np.asarray(feats), _os.path.join(self.debug_dir, "trigger_mfcc.png"))
        return out


@dataclass
class UltrasonicPoisoned:
    bd_train: ArraySet
    bd_test: ArraySet
    clean_test: ArraySet
    trigger: np.ndarray


def resolve_trigger_wave_path(cfg: AttackConfig) -> str:
    """Prefer the genuine reference asset (utils/ultra_trigger.py:24) over a
    run-local copy; synthesize into the run dir only when neither exists."""
    from audiobd_tpu.utils.assets import find_resource

    real = find_resource(os.path.join("Ultrasonic", "trigger.wav"))
    if real is not None:
        return real
    return os.path.join(cfg.record_dir, "resources", "Ultrasonic", "trigger.wav")


def _poison_split(clean_wav, clean_mfcc, clean_mfcc_dev, idx, trig, params, use_pallas):
    """Device-resident subset poisoning for one split.

    The additive trigger is applied to the ``idx`` rows on host (a cheap f32
    add — the full wav npy contract needs host copies anyway), their MFCCs
    are recomputed on device and merged into the (device-resident) clean
    features with ONE compiled scatter. Training adopts the device array
    zero-copy; the host npy view is patched from the same subset features,
    so the two views are bit-identical.
    Returns (bd_wav_host, bd_mfcc_host, bd_mfcc_dev).
    """
    from audiobd_tpu.data.speech_commands import batched_mfcc_device
    from audiobd_tpu.poison import device_prep

    bd_wav = clean_wav.copy()
    bd_mfcc_host = clean_mfcc.copy()
    feats_dev = clean_mfcc_dev if clean_mfcc_dev is not None else jnp.asarray(clean_mfcc)
    if len(idx) == 0:
        return bd_wav, bd_mfcc_host, feats_dev
    bd_wav[idx] = clean_wav[idx] + trig[None]  # (k, 1, T) + (1, 1, T)
    sub_feats = batched_mfcc_device(bd_wav[idx], params, use_pallas=use_pallas)
    bd_mfcc_dev = device_prep.scatter_rows(feats_dev, sub_feats, jnp.asarray(idx))
    bd_mfcc_host[idx] = np.asarray(sub_feats)
    return bd_wav, bd_mfcc_host, bd_mfcc_dev


def poison(cfg: AttackConfig, clean: CleanData, save: bool = True) -> UltrasonicPoisoned:
    trig = UltrasonicTrigger(
        cfg.ultra_trigger_size,
        cfg.trigger_pos,
        cont=cfg.trigger_cont,
        wave_path=resolve_trigger_wave_path(cfg),
    ).trigger()  # (1, 44100)
    assert clean.train_wav.shape[-1] == trig.shape[-1], (
        "ultrasonic requires the 44.1 kHz pipeline (cfg.dsp.sample_rate=44100)"
    )
    params = mfcc_params(cfg)

    n_train = len(clean.train_wav)
    rng = rnd.np_rng(cfg.train.seed, "ultrasonic_poison")
    poison_idx = rng.choice(n_train, size=int(n_train * cfg.poisoning_rate), replace=False)

    bd_train_wav, bd_train_mfcc, bd_train_mfcc_dev = _poison_split(
        clean.train_wav, clean.train_mfcc, clean.train_mfcc_dev,
        poison_idx, trig, params, cfg.dsp.use_pallas,
    )
    bd_train_label = clean.train_label.copy()
    bd_train_label[poison_idx] = cfg.target_label
    ind_train = np.zeros(n_train, dtype=np.int64)
    ind_train[poison_idx] = 1

    nontarget = clean.test_label != cfg.target_label
    bd_test_wav, bd_test_mfcc, bd_test_mfcc_dev = _poison_split(
        clean.test_wav, clean.test_mfcc, clean.test_mfcc_dev,
        np.flatnonzero(nontarget), trig, params, cfg.dsp.use_pallas,
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
    return UltrasonicPoisoned(
        bd_train=ArraySet(bd_train_mfcc_dev, bd_train_label, ind_train),
        bd_test=ArraySet(bd_test_mfcc_dev, bd_test_label, ind_test),
        clean_test=ArraySet(
            clean.test_mfcc_dev if clean.test_mfcc_dev is not None else clean.test_mfcc,
            clean.test_label,
        ),
        trigger=trig,
    )


if __name__ == "__main__":
    # Demo sweep mirroring the reference's ultra_trigger.py __main__
    # (utils/ultra_trigger.py:113-121): every (size, pos) trigger variant with
    # debug plots, the last one written to ante.wav.
    for size in (15, 30, 45, 60):
        for pos in ("start", "mid", "end"):
            gen = UltrasonicTrigger(size, pos, cont=True, debug=True)
            trig = gen.trigger()
    from audiobd_tpu.data.wavio import write_wav

    write_wav("ante.wav", trig[0], TRIGGER_SR)
