"""Data layer tests: WAV codec round trip, native batch decoder parity,
ingest + clean-cache contract on a synthetic wav tree."""

import os

import numpy as np
import pytest

from audiobd_tpu.configs import make_config
from audiobd_tpu.data.native import decode_batch, get_lib
from audiobd_tpu.data.speech_commands import load_clean_data, prepare_clean_dataset
from audiobd_tpu.data.wavio import read_wav, write_wav


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(8000) * 0.3).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_wav(path, wav, 16000)
    back, sr = read_wav(path)
    assert sr == 16000
    assert back.shape == (1, 8000)
    # PCM16 saturates outside [-1, 1): compare against the clipped signal.
    expected = np.clip(wav, -1.0, 32767.0 / 32768.0)
    np.testing.assert_allclose(back[0], expected, atol=1.0 / 32768)


def test_native_decoder_matches_python(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    refs = []
    for i in range(12):
        n = rng.integers(4000, 16001)
        wav = (rng.standard_normal(n) * 0.4).astype(np.float32)
        path = str(tmp_path / f"{i}.wav")
        write_wav(path, wav, 16000)
        paths.append(path)
        refs.append(wav)
    out, lengths, rates = decode_batch(paths, 16000)
    assert out.shape == (12, 16000)
    for i, ref in enumerate(refs):
        n = min(len(ref), 16000)
        assert lengths[i] == len(ref)
        assert rates[i] == 16000
        back, _ = read_wav(paths[i])
        np.testing.assert_allclose(out[i, :n], back[0, :n], atol=1e-6)
        assert (out[i, n:] == 0).all()


def test_native_lib_builds():
    # The toolchain is baked into the image; the native path must be live.
    assert get_lib() is not None


def _make_wav_tree(root, labels, per_class=6, sr=16000, seed=3):
    rng = np.random.default_rng(seed)
    for label in labels:
        d = os.path.join(root, label)
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            n = sr if i % 3 else sr + 500  # all pass the >= 1 s filter
            wav = (0.3 * np.sin(2 * np.pi * (300 + 100 * i) * np.arange(n) / sr)).astype(np.float32)
            write_wav(os.path.join(d, f"{i}.wav"), wav, sr)
        # one too-short clip that must be filtered out
        write_wav(os.path.join(d, "short.wav"), np.zeros(sr // 2, np.float32), sr)


def test_prepare_clean_dataset_contract(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    labels = ["yes", "no", "up"]
    _make_wav_tree("data_tree", labels)
    cfg = make_config("badnets", dataset="SCDv1-10", result="ingest_test")
    # narrow the label map for the test tree
    import audiobd_tpu.configs as C

    monkeypatch.setitem(C.DATASET_LABELS, "SCDv1-10", labels)
    data = prepare_clean_dataset(cfg, data_path="data_tree", save=True)
    n_total = 3 * 6  # short clips filtered
    assert len(data.train_wav) + len(data.test_wav) == n_total
    assert data.train_wav.shape[1:] == (1, 16000)
    assert data.train_mfcc.shape[1:] == (1, 101, 40)
    # cache round-trip
    import dataclasses

    cfg2 = dataclasses.replace(cfg, load_clean_data=True)
    cached = load_clean_data(cfg2)
    np.testing.assert_array_equal(cached.train_mfcc, data.train_mfcc)
    np.testing.assert_array_equal(cached.test_label, data.test_label)
