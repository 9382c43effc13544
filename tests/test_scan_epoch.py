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


def test_nhwc_layout_parity():
    """feature_layout="nhwc" (dataset stored (N,F,M,1), model skips the
    per-step transpose) must train identically to the NCHW default: same
    param tree, same per-epoch metrics, same learned params."""
    model, tx, state, data = _setup()
    model_nhwc = build_model("smallcnn", 10, 224, input_layout="nhwc")
    vars_nhwc = model_nhwc.init(
        jax.random.PRNGKey(0), np.transpose(data.feats[:1], (0, 2, 3, 1)), train=False
    )
    state_nhwc = TrainState.create(vars_nhwc, tx)
    # same init: the transpose is outside any parameterized op
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(state_nhwc.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    key = rnd.named_key(35, "dropout")
    dset = DeviceDataset(data)
    dset_nhwc = DeviceDataset(data, layout="nhwc")
    assert dset_nhwc.feats.shape == (100, 32, 13, 1)
    s1, m1 = run_train_epoch_scan(
        make_train_epoch_fn(model, tx, donate=False), state, dset, 32, key, rnd.np_rng(35, "s")
    )
    s2, m2 = run_train_epoch_scan(
        make_train_epoch_fn(model_nhwc, tx, donate=False), state_nhwc, dset_nhwc, 32, key,
        rnd.np_rng(35, "s"),
    )
    assert abs(m1["loss"] - m2["loss"]) < 1e-6
    assert m1["mix_acc"] == m2["mix_acc"] and m1["asr"] == m2["asr"]
    for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)
    e1 = run_eval_scan(make_eval_epoch_fn(model), s1, dset, 32)
    e2 = run_eval_scan(make_eval_epoch_fn(model_nhwc), s2, dset_nhwc, 32)
    assert abs(e1["loss"] - e2["loss"]) < 1e-6 and e1["acc"] == e2["acc"]


def test_nhwc_layout_rnn_models():
    """The squeeze-based RNN and the attention model accept NHWC input."""
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((4, 1, 32, 13)).astype(np.float32)
    nhwc = np.transpose(feats, (0, 2, 3, 1))
    for name, fs in (("rnn", 32), ("lstmwithattention", 32)):
        a = build_model(name, 10, fs, n_mfcc=13)
        b = build_model(name, 10, fs, n_mfcc=13, input_layout="nhwc")
        va = a.init(jax.random.PRNGKey(0), feats, train=False)
        vb = b.init(jax.random.PRNGKey(0), nhwc, train=False)
        ya = a.apply(va, feats, train=False)
        yb = b.apply(vb, nhwc, train=False)
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), rtol=1e-6, atol=1e-6)
