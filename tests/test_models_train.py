"""Short training runs for every architecture: catches train-mode bugs
(BN mutation, dropout rng, LSTM scan grads) that forward-only tests miss."""

import numpy as np
import optax
import pytest

import jax

from audiobd_tpu.configs import linear_features_for
from audiobd_tpu.models import build_model
from audiobd_tpu.train.loop import ArraySet, make_train_step, run_train_epoch
from audiobd_tpu.train.state import TrainState
from audiobd_tpu.utils import random as rnd

SHAPES = {"daba": (32, 40)}  # one compact shape exercises every model family


@pytest.mark.parametrize(
    "model_name", ["smallcnn", "largecnn", "smalllstm", "lstmwithattention", "rnn", "resnet"]
)
def test_two_epochs_reduce_loss(model_name):
    frames, n_mfcc = SHAPES["daba"]
    feats_size = linear_features_for("daba", model_name)
    model = build_model(model_name, 10, feats_size, n_mfcc=n_mfcc)

    rng = np.random.default_rng(4)
    n = 96
    labels = rng.integers(0, 10, n).astype(np.int64)
    # Make the task learnable: class-dependent mean pattern + noise.
    base = rng.standard_normal((10, 1, frames, n_mfcc)).astype(np.float32)
    feats = base[labels] * 3.0 + rng.standard_normal((n, 1, frames, n_mfcc)).astype(np.float32)
    data = ArraySet(feats, labels, np.zeros(n, np.int64))

    tx = optax.adam(3e-3)
    variables = model.init(jax.random.PRNGKey(0), feats[:1], train=False)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx)
    np_rng = rnd.np_rng(35, "mshuffle")
    key = rnd.named_key(35, "mdrop")

    losses = []
    for _ in range(3):
        state, m = run_train_epoch(step, state, data, 32, key, np_rng)
        losses.append(m["loss"])
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
