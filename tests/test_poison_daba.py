"""DABA overlay semantics + selection + poisoning tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from audiobd_tpu.configs import make_config
from audiobd_tpu.data.speech_commands import make_synthetic_clean_data
from audiobd_tpu.poison import daba


def test_dbfs_of_known_sine():
    t = np.arange(16000) / 16000
    x = jnp.asarray((0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32))
    # rms of a 0.5 sine = 0.5/sqrt(2) → 20·log10 = −9.03 dBFS
    assert abs(float(daba.dbfs(x)) - (-9.03)) < 0.05


def test_overlay_gain_targets():
    t = np.arange(16000) / 16000
    host = jnp.asarray((0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32))[None]
    trig = jnp.asarray((0.5 * np.sin(2 * np.pi * 5000 * t)).astype(np.float32))
    mixed = daba.overlay_db(host, trig, -20.0)
    resid = np.asarray(mixed - host)[0]  # what got added
    # The added trigger should sit at ≈ −20 dBFS.
    assert abs(float(daba.dbfs(jnp.asarray(resid))) - (-20.0)) < 0.1
    # 'auto' matches the host level.
    mixed_auto = daba.overlay_db(host, trig, "auto")
    resid_a = np.asarray(mixed_auto - host)[0]
    assert abs(float(daba.dbfs(jnp.asarray(resid_a))) - float(daba.dbfs(host[0]))) < 0.1
    # saturation
    loud = daba.overlay_db(host * 3.0, trig, 0.0)
    assert float(jnp.max(jnp.abs(loud))) <= 1.0


def test_variant_gain_cycle():
    gains = daba.gen_trigger_variants_db(90)
    vals, counts = np.unique(gains, return_counts=True)
    assert set(vals) == set(daba.VARIANT_DBS.tolist())
    assert counts.max() - counts.min() <= 1  # cyclic assignment is balanced


def test_trigger_pool_deterministic(tmp_path):
    p1 = daba.synthesize_trigger_pool(None)
    p2 = daba.synthesize_trigger_pool(str(tmp_path / "pool"))
    assert p1.shape == (60, 16000)
    np.testing.assert_array_equal(p1, p2)
    loaded = daba.load_trigger_pool(str(tmp_path / "pool"))
    assert loaded.shape == (60, 16000)
    # wav round-trip quantizes to int16
    np.testing.assert_allclose(loaded, p1, atol=1.0 / 32768)


def test_daba_poison_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = make_config("daba", result="daba_test", host_candidates=100, poisoning_rate=0.1)
    clean = make_synthetic_clean_data(cfg, n_per_class=12)
    out = daba.poison(cfg, clean, save=False)

    n_train = len(clean.train_wav)
    expected = round(0.1 * n_train)
    assert int(out.bd_train.indicators.sum()) == expected
    idx = np.flatnonzero(out.bd_train.indicators)
    # Poisoned hosts relabeled to target and never from the target class.
    assert (out.bd_train.labels[idx] == cfg.target_label).all()
    assert (clean.train_label[idx] != cfg.target_label).all()
    # Features recomputed for poisoned rows only.
    assert not np.allclose(out.bd_train.feats[idx], clean.train_mfcc[idx])
    keep = np.flatnonzero(out.bd_train.indicators == 0)
    np.testing.assert_array_equal(out.bd_train.feats[keep], clean.train_mfcc[keep])
    # Test contract.
    assert (out.bd_test.labels == cfg.target_label).all()
    assert out.bd_test.indicators.sum() == (clean.test_label != cfg.target_label).sum()
    assert out.trigger.shape == (16000,)


def test_daba_poison_zero_rate(tmp_path, monkeypatch):
    """Clean-control run: rate 0 must yield an unpoisoned train set, not a
    jnp.concatenate([]) crash in the empty-subset MFCC recompute."""
    monkeypatch.chdir(tmp_path)
    cfg = make_config("daba", result="daba_zero", host_candidates=40, poisoning_rate=0.0)
    clean = make_synthetic_clean_data(cfg, n_per_class=8)
    out = daba.poison(cfg, clean, save=False)
    assert int(out.bd_train.indicators.sum()) == 0
    np.testing.assert_array_equal(out.bd_train.feats, clean.train_mfcc)
    np.testing.assert_array_equal(out.bd_train.labels, clean.train_label)


def test_batched_mfcc_device_empty():
    from audiobd_tpu.data.speech_commands import batched_mfcc_device, mfcc_params

    cfg = make_config("badnets", result="mfcc_empty")
    out = batched_mfcc_device(np.zeros((0, 1, 16000), np.float32), mfcc_params(cfg))
    full = batched_mfcc_device(np.zeros((2, 1, 16000), np.float32), mfcc_params(cfg))
    assert out.shape == (0,) + full.shape[1:] and out.dtype == full.dtype


def test_selection_modes_differ(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = make_config("daba", result="daba_sel", host_candidates=60, poisoning_rate=8)
    clean = make_synthetic_clean_data(cfg, n_per_class=10)
    pool = daba.synthesize_trigger_pool(None)[:16]
    hosts = clean.train_wav[:40, 0, :]
    t1, h1 = daba.select_trigger_and_hosts(cfg, pool, hosts, 8)
    import dataclasses

    cfg2 = dataclasses.replace(cfg, trigger_selection_mode="Cer")
    t2, h2 = daba.select_trigger_and_hosts(cfg2, pool, hosts, 8)
    assert t1 == t2  # same trigger (min entropy)
    assert len(h1) == len(h2) == 8
    assert set(h1.tolist()) != set(h2.tolist())  # min-Inf vs max-Inf hosts
