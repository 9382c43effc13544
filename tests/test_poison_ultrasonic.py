"""Ultrasonic trigger + poisoning tests."""

import numpy as np
import pytest

from audiobd_tpu.configs import make_config
from audiobd_tpu.data.speech_commands import make_synthetic_clean_data
from audiobd_tpu.poison.ultrasonic import (
    DIVIDER,
    TriggerInfeasible,
    UltrasonicTrigger,
    synthesize_trigger_wave,
    poison,
)


def test_synthesized_trigger_is_ultrasonic(tmp_path):
    wav = synthesize_trigger_wave(str(tmp_path / "trig.wav"))
    assert wav.shape == (1, 44100)
    spec = np.abs(np.fft.rfft(wav[0]))
    freqs = np.fft.rfftfreq(44100, 1 / 44100)
    audible = spec[freqs < 20000].sum()
    ultra = spec[freqs >= 20000].sum()
    assert ultra > 50 * audible


@pytest.mark.parametrize("size,pos", [(15, "start"), (30, "mid"), (45, "end"), (60, "start")])
def test_trigger_mask_cont(tmp_path, size, pos):
    trig = UltrasonicTrigger(size, pos, cont=True, wave_path=str(tmp_path / "t.wav")).trigger()
    nz = np.flatnonzero(trig[0])
    expected_points = (44100 // DIVIDER) * size
    # Nonzero span should sit inside the expected window (signal can have
    # exact zeros inside the window, so compare span bounds, not counts).
    assert len(nz) > 0.9 * expected_points
    if pos == "start":
        assert nz[0] == 0 and nz[-1] <= expected_points
    elif pos == "end":
        assert nz[-1] == 44100 - 1 and nz[0] >= 44100 - expected_points - 1
    else:
        mid = 44100 // 2
        assert abs((nz[0] + nz[-1]) / 2 - mid) < DIVIDER


def test_trigger_mask_non_cont(tmp_path):
    trig = UltrasonicTrigger(60, "start", cont=False, wave_path=str(tmp_path / "t.wav")).trigger()
    nz = np.flatnonzero(trig[0])
    # 5 chunks — find gaps.
    gaps = np.flatnonzero(np.diff(nz) > 1)
    assert len(gaps) == 4


@pytest.mark.parametrize("size,pos", [(0, "start"), (101, "mid"), (50, "middle")])
def test_trigger_infeasible(tmp_path, size, pos):
    with pytest.raises(TriggerInfeasible):
        UltrasonicTrigger(size, pos, wave_path=str(tmp_path / "t.wav"))


def test_ultrasonic_poison(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = make_config("ultrasonic", result="ultra_test", batch_size=32)
    clean = make_synthetic_clean_data(cfg, n_per_class=6)
    out = poison(cfg, clean, save=False)
    n_train = len(clean.train_wav)
    assert out.bd_train.indicators.sum() == int(n_train * cfg.poisoning_rate)
    # Poisoned rows' features differ from clean; labels flipped.
    idx = np.flatnonzero(out.bd_train.indicators)
    assert not np.allclose(out.bd_train.feats[idx], clean.train_mfcc[idx])
    assert (out.bd_train.labels[idx] == cfg.target_label).all()
    # Non-poisoned untouched.
    keep = np.flatnonzero(out.bd_train.indicators == 0)
    np.testing.assert_array_equal(out.bd_train.feats[keep], clean.train_mfcc[keep])
    assert (out.bd_test.labels == cfg.target_label).all()


def test_trigger_debug_plots(tmp_path):
    trig = UltrasonicTrigger(
        30, "mid", wave_path=str(tmp_path / "t.wav"),
        debug=True, debug_dir=str(tmp_path / "dbg"),
    ).trigger()
    assert trig.shape == (1, 44100)
    import os

    for name in ("trigger_fft.png", "trigger_wave.png", "trigger_mfcc.png"):
        assert os.path.exists(tmp_path / "dbg" / name)
