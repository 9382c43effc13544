"""Checkpoint resume: a second train_attack(resume=True) restarts from the
saved params/opt_state instead of scratch."""

import os

import numpy as np

from audiobd_tpu.configs import make_config
from audiobd_tpu.data.speech_commands import make_synthetic_clean_data
from audiobd_tpu.poison import badnets
from audiobd_tpu.train.trainer import train_attack


def test_resume_continues_from_checkpoint(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = make_config(
        "badnets", result="resume_test", model="smallcnn",
        num_epochs=4, batch_size=64, learning_rate=1e-3,
    )
    clean = make_synthetic_clean_data(cfg, n_per_class=16)
    poisoned = badnets.poison(cfg, clean, save=False)

    r1 = train_attack(cfg, poisoned.bd_train, poisoned.clean_test, poisoned.bd_test, verbose=False)
    assert os.path.exists(os.path.join(cfg.record_dir, "checkpoint"))
    loss_after_run1 = r1.history["train_loss"][-1]

    r2 = train_attack(
        cfg, poisoned.bd_train, poisoned.clean_test, poisoned.bd_test,
        verbose=False, resume=True,
    )
    # Resumed training starts from the trained weights: its FIRST epoch must
    # already be far better than a cold start's first epoch.
    assert r2.history["train_loss"][0] < r1.history["train_loss"][0] * 0.6
    assert r2.history["train_loss"][0] < loss_after_run1 * 2.0
