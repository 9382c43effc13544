"""Serving entry (cli/infer.py): checkpoint reload + wav classification."""

import sys

import numpy as np

from audiobd_tpu.configs import make_config
from audiobd_tpu.data.speech_commands import make_synthetic_clean_data, save_clean_data
from audiobd_tpu.data.wavio import write_wav
from audiobd_tpu.poison import badnets
from audiobd_tpu.train.trainer import train_attack


def test_infer_cli(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    cfg = make_config("badnets", result="infer_test", batch_size=32, num_epochs=2)
    clean = make_synthetic_clean_data(cfg, n_per_class=6)
    save_clean_data(cfg, clean)
    poisoned = badnets.poison(cfg, clean)
    train_attack(cfg, poisoned.bd_train, poisoned.clean_test, poisoned.bd_test, verbose=False)

    from audiobd_tpu.cli.infer import main

    # wav path: featurize + classify two clips (one too-short → zero-padded)
    sr = cfg.dsp.sample_rate
    write_wav("a.wav", (0.2 * np.sin(2 * np.pi * 300 * np.arange(sr) / sr)).astype(np.float32), sr)
    write_wav("b.wav", np.zeros(sr // 2, np.float32), sr)
    monkeypatch.setattr(sys, "argv", ["infer", "--result", "infer_test", "--wav", "a.wav", "b.wav"])
    probs = main()
    assert probs.shape == (2, cfg.num_classes)
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-5)

    # directory expansion + JSON output: one object per clip, stable order
    import json
    import os

    os.makedirs("clips/sub", exist_ok=True)
    os.replace("a.wav", "clips/a.wav")
    os.replace("b.wav", "clips/sub/b.wav")
    monkeypatch.setattr(
        sys, "argv", ["infer", "--result", "infer_test", "--wav", "clips", "--json"]
    )
    capsys.readouterr()  # drain training/first-run output
    probs = main()
    out = capsys.readouterr().out.strip().splitlines()
    rows = [json.loads(line) for line in out]
    assert [r["path"] for r in rows] == [
        os.path.join("clips", "a.wav"), os.path.join("clips", "sub", "b.wav")
    ]
    assert probs.shape == (2, cfg.num_classes)
    for r in rows:
        assert r["label"] == r["top"][0]["label"]
        assert 0.0 <= r["top"][0]["prob"] <= 1.0

    # eval path: scores the cached clean test split (json + human modes)
    monkeypatch.setattr(
        sys, "argv", ["infer", "--result", "infer_test", "--eval_clean", "--json"]
    )
    ev = main()
    assert 0.0 <= ev["acc"] <= 100.0
    payload = json.loads(capsys.readouterr().out.strip())
    assert payload["clean_test_acc"] == round(float(ev["acc"]), 4)
    monkeypatch.setattr(sys, "argv", ["infer", "--result", "infer_test", "--eval_clean"])
    ev = main()
    assert 0.0 <= ev["acc"] <= 100.0
