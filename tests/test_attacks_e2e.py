"""End-to-end attack-effectiveness tests for JingleBack, DABA and
Ultrasonic: poison the synthetic dataset, train briefly, assert the backdoor
actually installs (high ASR) while the model still learns the task.

(BadNets e2e lives in test_train_badnets.py; FlowMur's optimization
mechanism in test_poison_flowmur.py.)
"""

import os

import pytest

from audiobd_tpu.configs import make_config
from audiobd_tpu.data.speech_commands import make_synthetic_clean_data
from audiobd_tpu.train.trainer import train_attack

pytestmark = pytest.mark.slow


def _run(cfg, poisoned):
    return train_attack(cfg, poisoned.bd_train, poisoned.clean_test, poisoned.bd_test,
                        verbose=False, save=False)


def test_jingleback_distortion_e2e(tmp_path, monkeypatch):
    from audiobd_tpu.poison import jingleback

    monkeypatch.chdir(tmp_path)
    cfg = make_config(
        "jingleback", result="jb_e2e", style=1, model="smallcnn",
        num_epochs=8, batch_size=64, learning_rate=1e-3, poisoning_rate=0.15,
    )
    clean = make_synthetic_clean_data(cfg, n_per_class=20)
    poisoned = jingleback.poison(cfg, clean, save=False)
    result = _run(cfg, poisoned)
    assert result.history["test_clean_acc"][-1] > 55.0
    assert result.history["test_asr"][-1] > 70.0


@pytest.mark.parametrize("style", [0, 3])
def test_jingleback_pitch_shift_styles_e2e(tmp_path, monkeypatch, style):
    """Styles 0 and 3 are the phase-vocoder pitch-shift chains (reference
    utils/styles_trigger.py:12-14,31-35) — the riskiest DSP; the attack must
    install end-to-end through them, not just pass property tests."""
    from audiobd_tpu.poison import jingleback

    monkeypatch.chdir(tmp_path)
    cfg = make_config(
        "jingleback", result=f"jb_style{style}_e2e", style=style, model="smallcnn",
        num_epochs=8, batch_size=64, learning_rate=1e-3, poisoning_rate=0.15,
    )
    clean = make_synthetic_clean_data(cfg, n_per_class=20)
    poisoned = jingleback.poison(cfg, clean, save=False)
    result = _run(cfg, poisoned)
    assert result.history["test_clean_acc"][-1] > 55.0
    assert result.history["test_asr"][-1] > 70.0


def test_daba_overlay_e2e(tmp_path, monkeypatch):
    from audiobd_tpu.poison import daba

    monkeypatch.chdir(tmp_path)
    cfg = make_config(
        "daba", result="daba_e2e", model="smallcnn", host_candidates=120,
        num_epochs=8, batch_size=64, learning_rate=1e-3, poisoning_rate=0.15,
        variant=False, po_db=-5.0,  # loud trigger → installs fast on tiny data
    )
    clean = make_synthetic_clean_data(cfg, n_per_class=20)
    poisoned = daba.poison(cfg, clean, save=False)
    result = _run(cfg, poisoned)
    assert result.history["test_clean_acc"][-1] > 55.0
    assert result.history["test_asr"][-1] > 70.0


def test_ultrasonic_e2e(tmp_path, monkeypatch):
    from audiobd_tpu.poison import ultrasonic

    monkeypatch.chdir(tmp_path)
    cfg = make_config(
        "ultrasonic", result="ultra_e2e", model="smallcnn",
        num_epochs=8, batch_size=32, learning_rate=1e-3, poisoning_rate=0.15,
    )
    clean = make_synthetic_clean_data(cfg, n_per_class=10)
    poisoned = ultrasonic.poison(cfg, clean, save=False)
    result = _run(cfg, poisoned)
    assert result.history["test_clean_acc"][-1] > 50.0
    assert result.history["test_asr"][-1] > 70.0


def test_30_class_dataset_no_hardcoding(tmp_path, monkeypatch):
    """SCDv1-30: nothing in the pipeline may assume 10 classes."""
    from audiobd_tpu.poison import badnets

    monkeypatch.chdir(tmp_path)
    cfg = make_config(
        "badnets", dataset="SCDv1-30", num_classes=30, result="bd30",
        num_epochs=2, batch_size=64, learning_rate=1e-3,
    )
    assert len(cfg.labels) == 30
    clean = make_synthetic_clean_data(cfg, n_per_class=4)
    poisoned = badnets.poison(cfg, clean, save=False)
    result = _run(cfg, poisoned)
    assert result.epochs_ran == 2
    assert 0 <= result.history["test_asr"][-1] <= 100
