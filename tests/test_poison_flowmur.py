"""FlowMur surrogate + trigger-optimization + poisoning tests.

The optimization test is the important one: it verifies gradients flow
through the MFCC front-end into the waveform trigger and that a few epochs
of optimization measurably increase the surrogate's target-class rate on
triggered audio (the attack's core mechanism).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from audiobd_tpu.configs import make_config
from audiobd_tpu.data.speech_commands import batched_mfcc, make_synthetic_clean_data, mfcc_params
from audiobd_tpu.poison import flowmur


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("flowmur")
    import os

    os.chdir(tmp)
    cfg = make_config("flowmur", result="flowmur_test", batch_size=32, num_epochs=4)
    clean = make_synthetic_clean_data(cfg, n_per_class=16)
    model, state = flowmur.pretrain_surrogate(cfg, clean, runs=1, max_epochs=8, verbose=False)
    return cfg, clean, model, state


def test_deploy_trigger_blend():
    wavs = jnp.ones((2, 100)) * 0.5
    trig = jnp.ones((10,)) * 0.2
    pos = jnp.array([0, 50])
    out = np.asarray(flowmur.deploy_trigger(wavs, trig, pos))
    assert out.shape == (2, 100)
    # Outside the trigger window: wav scaled by s/(s+1) < 1.
    assert (out[0, 20:] < 0.5).all()
    # Inside: blended with the trigger.
    assert not np.allclose(out[1, 50:60], out[1, 40:50])


def test_trigger_optimization_reduces_target_loss(setup):
    cfg, clean, model, state = setup
    import dataclasses

    fast_cfg = dataclasses.replace(cfg, flowmur_opt_lr=2e-2)
    hosts = flowmur.select_trigger_hosts(fast_cfg, clean, n_hosts=64)
    trigger = flowmur.optimize_trigger(
        fast_cfg, model, state, hosts, epochs=40, batch_size=32, verbose=False, save_snapshots=False
    )
    length = int(cfg.trigger_duration * cfg.dsp.sample_rate)
    assert trigger.shape == (1, length)
    assert np.abs(trigger).max() <= cfg.flowmur_clamp + 1e-6
    assert not np.allclose(trigger, 0.1)  # moved off the init

    params = mfcc_params(cfg)
    rng = np.random.default_rng(0)
    test_wavs = clean.test_wav[:32]
    t = test_wavs.shape[-1]
    pos = rng.integers(0, t - length + 1, size=len(test_wavs))

    def target_ce(trig):
        """CE toward the target class on triggered held-out audio —
        the optimization's objective, evaluated out-of-sample."""
        mixed = np.asarray(
            flowmur.deploy_trigger(
                jnp.asarray(test_wavs[:, 0, :]), jnp.asarray(trig[0]), jnp.asarray(pos)
            )
        )[:, None, :]
        feats = batched_mfcc(mixed, params)
        logits = np.asarray(
            model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                jnp.asarray(feats), train=False,
            )
        )
        logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
        return float(-logp[:, cfg.target_label].mean())

    ce_opt = target_ce(trigger)
    ce_init = target_ce(np.full((1, length), 0.1, np.float32))
    # 40 epochs is far short of the reference's 300x5000-sample run; assert
    # the objective moved meaningfully in the right direction (typically
    # ~11% at this budget).
    assert ce_opt < ce_init * 0.95, (ce_init, ce_opt)

    # Reference-faithful accumulated mode (an Adam step per batch on the
    # prefix-summed epoch gradient, utils/flowmur_generate_trigger.py:100-105)
    # must also descend.
    acc_cfg = dataclasses.replace(fast_cfg, flowmur_update="accumulated")
    trigger_acc = flowmur.optimize_trigger(
        acc_cfg, model, state, hosts, epochs=40, batch_size=32, verbose=False, save_snapshots=False
    )
    assert np.abs(trigger_acc).max() <= cfg.flowmur_clamp + 1e-6
    assert not np.allclose(trigger_acc, 0.1)
    ce_acc = target_ce(trigger_acc)
    assert ce_acc < ce_init * 0.98, (ce_init, ce_acc)
    # The two update rules are genuinely different optimization paths.
    assert not np.allclose(trigger_acc, trigger)


def test_flowmur_poison_semantics(setup):
    cfg, clean, model, state = setup
    length = int(cfg.trigger_duration * cfg.dsp.sample_rate)
    trigger = np.full((1, length), 0.05, np.float32)
    out = flowmur.poison(cfg, clean, trigger, save=False)
    # Quirk: indicator marks ALL target-class rows (flowmur.py:88-89).
    np.testing.assert_array_equal(
        out.bd_train.indicators, (clean.train_label == cfg.target_label).astype(np.int64)
    )
    # Labels on the train side unchanged (clean-label attack).
    np.testing.assert_array_equal(out.bd_train.labels, clean.train_label)
    # Test set drops target-class rows entirely.
    assert len(out.bd_test) == int((clean.test_label != cfg.target_label).sum())
    assert (out.bd_test.labels == cfg.target_label).all()
    assert (out.bd_test.indicators == 1).all()


def test_restart_streams_distinct(setup):
    """flowmur_restarts draws distinct RNG streams per restart — the
    candidates must genuinely differ for probe selection to have choices."""
    cfg, clean, model, state = setup
    hosts = flowmur.select_trigger_hosts(cfg, clean, n_hosts=32)
    t0 = flowmur.optimize_trigger(
        cfg, model, state, hosts, epochs=2, verbose=False, save_snapshots=False, restart=0
    )
    t1 = flowmur.optimize_trigger(
        cfg, model, state, hosts, epochs=2, verbose=False, save_snapshots=False, restart=1
    )
    t0b = flowmur.optimize_trigger(
        cfg, model, state, hosts, epochs=2, verbose=False, save_snapshots=False, restart=0
    )
    assert t0.shape == t1.shape
    np.testing.assert_array_equal(t0, t0b)  # deterministic per restart index
    assert np.abs(t0 - t1).max() > 1e-6  # distinct across restart indices


def test_select_trigger_probe_path(setup):
    """select_trigger with restarts>1 runs the probe victims and returns one
    of the candidates (tiny budgets — the machinery, not the science)."""
    import dataclasses

    cfg, clean, model, state = setup
    cfg2 = dataclasses.replace(cfg)
    cfg2.train = dataclasses.replace(cfg.train, num_epochs=2)
    cfg2.flowmur_restarts = 2
    cfg2.flowmur_probe_epochs = 2
    cfg2.flowmur_opt_epochs = 2
    hosts = flowmur.select_trigger_hosts(cfg2, clean, n_hosts=32)
    trig = flowmur.select_trigger(cfg2, model, state, hosts, clean, verbose=False)
    cands = [
        flowmur.optimize_trigger(
            cfg2, model, state, hosts, epochs=2, verbose=False, save_snapshots=False, restart=r
        )
        for r in range(2)
    ]
    assert any(np.array_equal(trig, c) for c in cands)


def test_promote_snapshots(tmp_path):
    """The winning restart's suffixed sp_trigger snapshots are copied to the
    canonical names (reference-parity artifact,
    utils/flowmur_generate_trigger.py:112-116); other restarts' stay put."""
    snap = tmp_path / "poisoning_record"
    snap.mkdir()
    for r, val in ((0, 0.0), (1, 1.0), (2, 2.0)):
        suffix = "" if r == 0 else f"_r{r}"
        for epoch in (100, 200):
            np.save(snap / f"sp_trigger{epoch}{suffix}.npy", np.full((1, 4), val))
    flowmur._promote_snapshots(str(snap), best_r=2)
    for epoch in (100, 200):
        np.testing.assert_array_equal(
            np.load(snap / f"sp_trigger{epoch}.npy"), np.full((1, 4), 2.0)
        )
        # provenance files untouched
        np.testing.assert_array_equal(
            np.load(snap / f"sp_trigger{epoch}_r1.npy"), np.full((1, 4), 1.0)
        )
    # restart 0 winning is a no-op by construction (canonical names already
    # written by suffix ""); missing dir is a no-op too:
    flowmur._promote_snapshots(str(tmp_path / "absent"), best_r=1)
