"""End-to-end BadNets slice on the synthetic dataset.

Integration test of CLI-config → data → DSP → poisoning → jitted training →
metrics → checkpoint → CSV, on the simulated 8-device mesh. Asserts real
attack behavior: high clean accuracy AND high ASR after a few epochs.
"""

import os

import numpy as np
import pytest

from audiobd_tpu.configs import make_config
from audiobd_tpu.data.speech_commands import make_synthetic_clean_data
from audiobd_tpu.poison import badnets
from audiobd_tpu.train.checkpoint import load_checkpoint
from audiobd_tpu.train.trainer import train_attack


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("badnets_run")
    cfg = make_config(
        "badnets",
        dataset="SCDv1-10",
        model="smallcnn",
        result="badnets_test",
        num_epochs=6,
        batch_size=64,
        learning_rate=1e-3,
        patience=20,
    )
    os.makedirs(tmp / "record", exist_ok=True)
    os.chdir(tmp)
    return cfg


@pytest.fixture(scope="module")
def clean(cfg):
    return make_synthetic_clean_data(cfg, n_per_class=24)


def test_badnets_trigger_layout():
    trig = badnets.generate_trigger(40, 101, 5, save_path=None)
    assert trig.shape == (1, 101, 40)
    assert (trig[0, -5:, -5:] == -200).all()
    assert np.count_nonzero(trig) == 25


def test_poison_waveforms_device_matches_host_path(cfg, clean):
    """The fused device prep (waveform → MFCC → patch in one program, chunks
    dispatched without intermediate syncs) must reproduce the two-stage host
    path (batched_mfcc then apply_trigger) bit-for-bit."""
    import jax.numpy as jnp

    from audiobd_tpu.data.speech_commands import batched_mfcc, mfcc_params

    params = mfcc_params(cfg)
    wavs = clean.train_wav[:37]  # odd count: exercises the wrap-pad tail
    ind = np.zeros(37, np.int64)
    ind[[1, 5, 20, 36]] = 1
    trig = badnets.generate_trigger(40, 101, 5, save_path=None)

    fused = np.asarray(
        badnets.poison_waveforms_device(wavs, ind, trig, params, chunk=16)
    )
    ref = batched_mfcc(wavs, params)
    patched = np.asarray(badnets.apply_trigger(jnp.asarray(ref), jnp.asarray(trig)))
    expect = np.where(ind[:, None, None, None] == 1, patched, ref)
    np.testing.assert_array_equal(fused, expect)

    # int16 PCM ingest (half-byte transfers, dequantized on device) must
    # equal the host float path of the same dequantized values exactly.
    pcm = np.clip(np.round(np.asarray(wavs) * 32768.0), -32768, 32767).astype(np.int16)
    fused_pcm = np.asarray(
        badnets.poison_waveforms_device(pcm, ind, trig, params, chunk=16)
    )
    ref_pcm = batched_mfcc(pcm.astype(np.float32) / 32768.0, params)
    patched_pcm = np.asarray(badnets.apply_trigger(jnp.asarray(ref_pcm), jnp.asarray(trig)))
    expect_pcm = np.where(ind[:, None, None, None] == 1, patched_pcm, ref_pcm)
    np.testing.assert_array_equal(fused_pcm, expect_pcm)


def test_badnets_poison_counts(cfg, clean):
    poisoned = badnets.poison(cfg, clean, save=False)
    n_train = len(clean.train_mfcc)
    assert poisoned.bd_train.indicators.sum() == int(n_train * cfg.poisoning_rate)
    # Poisoned rows: label flipped + patch present.
    idx = np.flatnonzero(poisoned.bd_train.indicators)
    assert (poisoned.bd_train.labels[idx] == cfg.target_label).all()
    assert (poisoned.bd_train.feats[idx][:, 0, -1, -1] == -200).all()
    # Clean rows untouched.
    keep = np.flatnonzero(poisoned.bd_train.indicators == 0)
    np.testing.assert_array_equal(poisoned.bd_train.feats[keep], clean.train_mfcc[keep])
    # Test set: all labels target; target-class rows unpatched.
    assert (poisoned.bd_test.labels == cfg.target_label).all()
    assert poisoned.bd_test.indicators.sum() == (clean.test_label != cfg.target_label).sum()


def test_badnets_end_to_end(cfg, clean):
    poisoned = badnets.poison(cfg, clean, save=True)
    result = train_attack(cfg, poisoned.bd_train, poisoned.clean_test, poisoned.bd_test)

    assert result.epochs_ran >= 1
    # Synthetic classes are separable: expect real learning + a working backdoor.
    assert result.history["test_clean_acc"][-1] > 60.0
    assert result.history["test_asr"][-1] > 80.0

    # Path contract: CSVs + checkpoint + bd npys.
    assert os.path.exists(os.path.join(cfg.record_dir, "loss_result.csv"))
    assert os.path.exists(os.path.join(cfg.record_dir, "acc_result.csv"))
    assert os.path.exists(os.path.join(cfg.record_dir, cfg.dataset, "bd", "bd_train_mfcc.npy"))
    tree, spec = load_checkpoint(cfg.record_dir)
    assert spec["model"] == "smallcnn"
    assert "params" in tree and "batch_stats" in tree


def test_badnets_bf16_compute_matches_quality(cfg, clean):
    """Mixed precision (bf16 activations, f32 params/BN/loss) must reach the
    same attack quality as f32."""
    import dataclasses

    poisoned = badnets.poison(cfg, clean, save=False)
    cfg16 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, compute_dtype="bfloat16")
    )
    result = train_attack(
        cfg16, poisoned.bd_train, poisoned.clean_test, poisoned.bd_test,
        verbose=False, save=False,
    )
    assert result.history["test_clean_acc"][-1] > 60.0
    assert result.history["test_asr"][-1] > 80.0
