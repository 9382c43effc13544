"""Vmapped ensemble training: member-wise parity with solo scan epochs.

The ensemble engine (train/ensemble.py) has no reference counterpart — the
reference trains FlowMur's surrogates sequentially (reference
utils/flowmur_generate_trigger.py:15-47). These tests pin the contract that
member i of a vmapped ensemble reproduces a solo run with the same keys.
"""

import numpy as np
import optax

import jax
import jax.numpy as jnp

from audiobd_tpu.models import build_model
from audiobd_tpu.train.ensemble import (
    ensemble_size,
    init_ensemble,
    make_ensemble_eval_epoch_fn,
    make_ensemble_train_epoch_fn,
    member_state,
    run_ensemble_eval,
    run_ensemble_train_epoch,
    train_ensemble,
)
from audiobd_tpu.train.loop import ArraySet
from audiobd_tpu.train.scan_epoch import (
    DeviceDataset,
    make_eval_epoch_fn,
    make_train_epoch_fn,
    run_eval_scan,
    run_train_epoch_scan,
)
from audiobd_tpu.train.state import TrainState
from audiobd_tpu.utils import random as rnd


def _data(n=96, shape=(1, 32, 13), classes=10, seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal((n,) + shape).astype(np.float32)
    labels = rng.integers(0, classes, n).astype(np.int64)
    ind = (rng.random(n) < 0.2).astype(np.int64)
    return ArraySet(feats, labels, ind)


def test_ensemble_members_match_solo_runs():
    data = _data()
    model = build_model("smallcnn", 10, 224)
    tx = optax.adam(1e-3)
    dset = DeviceDataset(data)
    k = 3
    init_keys = [rnd.named_key(35, f"member_{i}") for i in range(k)]

    ens = init_ensemble(model, tx, jnp.asarray(data.feats[:1]), jnp.stack(init_keys))
    assert ensemble_size(ens) == k
    ens_epoch = make_ensemble_train_epoch_fn(model, tx, donate=False)
    ens_eval = make_ensemble_eval_epoch_fn(model)
    rngs = [rnd.np_rng(35, f"shuffle_{i}") for i in range(k)]
    for _ in range(2):
        ens, _ = run_ensemble_train_epoch(ens_epoch, ens, dset, 32, jnp.stack(init_keys), rngs)
    ens_metrics = run_ensemble_eval(ens_eval, ens, dset, 32)

    solo_epoch = make_train_epoch_fn(model, tx, donate=False)
    solo_eval = make_eval_epoch_fn(model)
    for i in range(k):
        variables = model.init(init_keys[i], jnp.asarray(data.feats[:1]), train=False)
        state = TrainState.create(variables, tx)
        np_rng = rnd.np_rng(35, f"shuffle_{i}")
        for _ in range(2):
            state, _ = run_train_epoch_scan(solo_epoch, state, dset, 32, init_keys[i], np_rng)
        solo = run_eval_scan(solo_eval, state, dset, 32)
        member = member_state(ens, i)
        leaves_e = jax.tree_util.tree_leaves(member.params)
        leaves_s = jax.tree_util.tree_leaves(state.params)
        for le, ls in zip(leaves_e, leaves_s):
            np.testing.assert_allclose(np.asarray(le), np.asarray(ls), rtol=2e-4, atol=2e-5)
        assert abs(ens_metrics["loss"][i] - solo["loss"]) < 1e-4
        assert abs(ens_metrics["acc"][i] - solo["acc"]) < 1e-6


def test_train_ensemble_early_stop_tracks_per_member_best():
    data = _data(n=64)
    model = build_model("smallcnn", 10, 224)
    tx = optax.adam(1e-2)
    k = 2
    init_keys = [rnd.named_key(35, f"m{i}") for i in range(k)]
    rngs = [rnd.np_rng(35, f"s{i}") for i in range(k)]
    best, history = train_ensemble(
        model, tx, data, data, init_keys, rngs,
        batch_size=32, max_epochs=6, patience=2,
    )
    assert history["val_loss"].shape[1] == k
    # members were initialized differently and trained independently
    p0 = jax.tree_util.tree_leaves(member_state(best, 0).params)[0]
    p1 = jax.tree_util.tree_leaves(member_state(best, 1).params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # best snapshot corresponds to the recorded best epoch's loss
    for i in range(k):
        e = history["epochs_to_best"][i]
        assert e >= 1
        assert history["val_loss"][e - 1, i] == history["val_loss"][: , i].min()
