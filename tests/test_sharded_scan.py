"""Sharded (multi-chip DP) scan epochs vs single-device semantics.

make_sharded_train_epoch_fn must reproduce the single-device scan step
exactly when fed the same global batch: psum'd loss/grads + sync-BN make one
sharded step numerically the global-batch step (SURVEY.md §2.5 DP layout).
Runs on the conftest 8-device CPU mesh.
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from audiobd_tpu.models.layers import TorchBatchNorm, TorchConv, TorchDense, nchw_to_nhwc
from audiobd_tpu.parallel.mesh import make_mesh
from audiobd_tpu.train.scan_epoch import (
    DeviceDataset,
    make_eval_epoch_fn,
    make_perm,
    make_sharded_eval_epoch_fn,
    make_sharded_perm,
    make_sharded_train_epoch_fn,
    make_train_epoch_fn,
    pad_plan,
    pad_rows,
)
from audiobd_tpu.train.state import TrainState


class TinyBNNet(nn.Module):
    """Conv → BN → pooled dense head; no dropout (so sharded and
    single-device steps are bit-comparable), sync-BN capable."""

    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nchw_to_nhwc(x)
        x = nn.relu(TorchConv(8, (2, 2))(x))
        x = TorchBatchNorm(axis_name=self.bn_axis)(x, train)
        x = x.reshape(x.shape[0], -1)
        return TorchDense(10)(x)


D = 4
N, H, W = 64, 9, 7


@pytest.fixture(scope="module")
def setup():
    mesh = make_mesh(n_data=D, n_model=1, devices=jax.devices()[:D])
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(N, 1, H, W)).astype(np.float32)
    labels = rng.integers(0, 10, N).astype(np.int32)
    ind = (rng.random(N) < 0.3).astype(np.int64)
    model = TinyBNNet()
    tx = optax.adam(1e-3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, H, W)), train=False)
    state = TrainState.create(variables, tx)
    return mesh, model, tx, state, feats, labels, ind


def _shard_arrays(mesh, feats, labels, ind, n_devices=D):
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data"))
    return tuple(
        jax.device_put(jnp.asarray(pad_rows(a, n_devices)), sh)
        for a in (feats, labels.astype(np.int32), ind.astype(np.int32))
    )


def test_one_step_matches_single_device(setup):
    """Same global batch (all N rows) → identical params, stats, metrics."""
    mesh, model, tx, state, feats, labels, ind = setup

    # single device: one batch of all rows, identity order
    fn1 = make_train_epoch_fn(model, tx, donate=False)
    perm1 = jnp.asarray(np.arange(N, dtype=np.int32).reshape(1, N))
    mask1 = jnp.ones((1, N), bool)
    s1, losses1, sums1 = fn1(
        state, jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(ind.astype(np.int32)),
        perm1, mask1, jax.random.PRNGKey(5),
    )

    # sharded: each shard contributes its 16 rows — same global batch
    fnD = make_sharded_train_epoch_fn(model, tx, mesh)
    perm, mask, n_padded = make_sharded_perm(None, N, D, N)
    f, l, i = _shard_arrays(mesh, feats, labels, ind)
    sD, lossesD, sumsD = fnD(
        state, f, l, i, jnp.asarray(perm), jnp.asarray(mask), jax.random.PRNGKey(5)
    )

    assert jnp.allclose(losses1, lossesD, atol=1e-5)
    assert jnp.array_equal(sums1, sumsD)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(sD.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # sync-BN: running stats must equal the single-device (global batch) ones
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.batch_stats), jax.tree_util.tree_leaves(sD.batch_stats)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_eval_sums_match_with_ragged_shards(setup):
    """n not divisible by D*B: wrap-padded slots masked out; metric sums
    (counts over every real row exactly once) equal the single-device plan."""
    mesh, model, tx, state, feats, labels, ind = setup
    n = 58  # ragged
    fe1 = make_eval_epoch_fn(model)
    nb, mask1 = pad_plan(n, 24)
    perm1 = jnp.asarray(make_perm(None, n, nb, 24))
    losses1, sums1 = fe1(
        state.params, state.batch_stats,
        jnp.asarray(feats[:n]), jnp.asarray(labels[:n]), jnp.asarray(ind[:n].astype(np.int32)),
        perm1, jnp.asarray(mask1),
    )

    feD = make_sharded_eval_epoch_fn(model, mesh)
    perm, mask, n_padded = make_sharded_perm(None, n, D, 24)
    f, l, i = _shard_arrays(mesh, feats[:n], labels[:n], ind[:n])
    lossesD, sumsD = feD(
        state.params, state.batch_stats, f, l, i, jnp.asarray(perm), jnp.asarray(mask)
    )
    assert int(sumsD[1]) == n
    assert jnp.array_equal(sums1, sumsD)


def test_sharded_training_learns(setup):
    """Multi-epoch sharded training on separable data reduces the loss."""
    mesh, model, tx, state, *_ = setup
    rng = np.random.default_rng(7)
    labels = np.repeat(np.arange(8), 8).astype(np.int32)
    feats = rng.normal(size=(64, 1, H, W)).astype(np.float32) * 0.1
    for row, lab in enumerate(labels):  # spatial class signature (BN-proof)
        feats[row, 0, lab % H, (2 * lab) % W] += 3.0
    tx = optax.adam(1e-2)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, H, W)), train=False)
    state = TrainState.create(variables, tx)
    fnD = make_sharded_train_epoch_fn(model, tx, mesh)
    np_rng = np.random.default_rng(3)
    first = last = None
    for epoch in range(25):
        perm, mask, n_padded = make_sharded_perm(np_rng, 64, D, 32)
        f, l, i = _shard_arrays(mesh, feats, labels, np.zeros(64))
        state, losses, sums = fnD(
            state, f, l, i, jnp.asarray(perm), jnp.asarray(mask), jax.random.PRNGKey(epoch)
        )
        if first is None:
            first = float(losses.mean())
        last = float(losses.mean())
        assert int(sums[1]) == 64
    assert last < first * 0.7


@pytest.mark.slow
def test_train_attack_sharded_end_to_end(tmp_path):
    """Full attack training through the trainer's sharded-scan branch
    (explicit opt-in on the CPU mesh) — the backdoor must still take."""
    import os

    from audiobd_tpu.configs import make_config
    from audiobd_tpu.data.speech_commands import make_synthetic_clean_data
    from audiobd_tpu.poison import badnets
    from audiobd_tpu.train.trainer import train_attack

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        cfg = make_config(
            "badnets", result="sharded_e2e", model="smallcnn",
            num_epochs=8, batch_size=64, learning_rate=1e-3,
        )
        cfg.train.sharded_scan_epochs = "on"
        clean = make_synthetic_clean_data(cfg, n_per_class=24)
        poisoned = badnets.poison(cfg, clean, save=False)
        result = train_attack(
            cfg, poisoned.bd_train, poisoned.clean_test, poisoned.bd_test,
            verbose=False, save=False,
        )
        assert result.history["test_asr"][-1] > 70.0
        assert result.history["test_clean_acc"][-1] > 40.0
    finally:
        os.chdir(cwd)


def test_small_n_many_devices():
    """Balanced layout: n barely above D must not produce an empty shard
    (a ceil split would: 9 rows on 8 shards -> shard 7 empty)."""
    from audiobd_tpu.train.scan_epoch import shard_layout

    mesh8 = make_mesh(n_data=8, n_model=1)
    n = 9
    n_loc, offsets, counts = shard_layout(n, 8)
    assert counts.min() == 1 and counts.sum() == n
    model = TinyBNNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, H, W)), train=False)
    rng = np.random.default_rng(11)
    feats = rng.normal(size=(n, 1, H, W)).astype(np.float32)
    labels = rng.integers(0, 10, n).astype(np.int32)
    fe = make_sharded_eval_epoch_fn(model, mesh8)
    perm, mask, _ = make_sharded_perm(None, n, 8, 8)
    f, l, i = _shard_arrays(mesh8, feats, labels, np.zeros(n), n_devices=8)
    losses, sums = fe(variables["params"], variables["batch_stats"], f, l, i,
                      jnp.asarray(perm), jnp.asarray(mask))
    assert int(sums[1]) == n
