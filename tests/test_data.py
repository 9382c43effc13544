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


def test_pcm16_decode_bit_equality(tmp_path):
    """Raw int16 decode, dequantized, must match the f32 decode bit-for-bit
    (2^-15 is a power of two — VERDICT r3 item 7's equality requirement)."""
    from audiobd_tpu.data.native import decode_batch_pcm16

    rng = np.random.default_rng(5)
    paths = []
    for i in range(8):
        n = int(rng.integers(4000, 16001))
        wav = (rng.standard_normal(n) * 0.4).astype(np.float32)
        path = str(tmp_path / f"p{i}.wav")
        write_wav(path, wav, 16000)
        paths.append(path)
    f32, lengths, rates = decode_batch(paths, 16000)
    pcm, lengths2, rates2, ok = decode_batch_pcm16(paths, 16000)
    assert ok.all() and (lengths == lengths2).all() and (rates == rates2).all()
    np.testing.assert_array_equal(pcm.astype(np.float32) * (1.0 / 32768.0), f32)


def test_pcm16_mfcc_bit_equality():
    """MFCCs from device-dequantized PCM must equal MFCCs from f32 wavs."""
    from audiobd_tpu.data.speech_commands import batched_mfcc_device, mfcc_params

    cfg = make_config("badnets")
    params = mfcc_params(cfg)
    rng = np.random.default_rng(6)
    pcm = (rng.standard_normal((5, 16000)) * 8000).astype(np.int16)
    f32 = pcm.astype(np.float32) * (1.0 / 32768.0)
    a = np.asarray(batched_mfcc_device(pcm, params))
    b = np.asarray(batched_mfcc_device(f32, params))
    np.testing.assert_array_equal(a, b)


def test_pcm16_rejects_other_widths():
    """Non-int16 integer PCM must raise, not silently mis-scale (ADVICE r3)."""
    import jax.numpy as jnp

    from audiobd_tpu.poison.device_prep import dequantize_pcm

    with pytest.raises(ValueError):
        dequantize_pcm(jnp.zeros((2, 16), jnp.int32))


def test_split_index_parity():
    """prepare_clean_dataset splits arange(n) and gathers; sklearn must give
    the identical permutation as splitting the arrays directly."""
    from sklearn.model_selection import train_test_split

    rng = np.random.default_rng(7)
    x = rng.standard_normal((37, 4)).astype(np.float32)
    y = rng.integers(0, 5, 37)
    xa, xb, ya, yb = train_test_split(x, y, test_size=0.2, random_state=35)
    ia, ib = train_test_split(np.arange(37), test_size=0.2, random_state=35)
    np.testing.assert_array_equal(x[ia], xa)
    np.testing.assert_array_equal(x[ib], xb)
    np.testing.assert_array_equal(y[ia], ya)
    np.testing.assert_array_equal(y[ib], yb)


def test_prepare_mixed_rate_pools(tmp_path, monkeypatch):
    """Off-rate files resample into the f32 pool and interleave with PCM16
    rows in original clip order."""
    monkeypatch.chdir(tmp_path)
    labels = ["yes", "no"]
    sr = 16000
    rng = np.random.default_rng(11)
    for label in labels:
        d = os.path.join("tree", label)
        os.makedirs(d, exist_ok=True)
        for i in range(4):
            wav = (0.2 * rng.standard_normal(sr)).astype(np.float32)
            write_wav(os.path.join(d, f"{i}.wav"), wav, sr)
        # an off-rate clip (1 s at 22050 Hz) that must take the resample path
        write_wav(os.path.join(d, "odd.wav"),
                  (0.2 * rng.standard_normal(22050)).astype(np.float32), 22050)
    cfg = make_config("badnets", dataset="SCDv1-10", result="mixed_test")
    import audiobd_tpu.configs as C

    monkeypatch.setitem(C.DATASET_LABELS, "SCDv1-10", labels)
    data = prepare_clean_dataset(cfg, data_path="tree", save=False)
    n_total = len(data.train_wav) + len(data.test_wav)
    assert n_total == 2 * 5  # 4 PCM16 + 1 resampled per class
    # device/host feature views agree
    np.testing.assert_array_equal(np.asarray(data.train_mfcc_dev), data.train_mfcc)
    # every row's features must equal a from-scratch recompute of its wav
    from audiobd_tpu.data.speech_commands import batched_mfcc, mfcc_params

    params = mfcc_params(cfg)
    np.testing.assert_allclose(
        batched_mfcc(data.test_wav, params), data.test_mfcc, atol=2e-4, rtol=1e-5)
