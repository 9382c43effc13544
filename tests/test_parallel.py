"""Mesh/sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from audiobd_tpu.models import build_model
from audiobd_tpu.parallel.mesh import make_mesh, shard_batch, shard_params_tp, shard_replicated
from audiobd_tpu.train.loop import ArraySet, make_train_step, run_train_epoch
from audiobd_tpu.train.state import TrainState
from audiobd_tpu.utils import random as rnd


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh_all = make_mesh()
    assert mesh_all.devices.size == len(jax.devices())


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh(n_data=8, n_model=1)
    batch = shard_batch(mesh, {"x": np.zeros((16, 4), np.float32)})
    spec = batch["x"].sharding.spec
    assert spec == P("data")


def test_shard_params_tp_splits_large_kernels():
    mesh = make_mesh(n_data=4, n_model=2)
    tree = {
        "big": jnp.zeros((64, 256)),    # sharded: last dim 256 % 2 == 0, >= 128
        "small": jnp.zeros((8, 10)),    # replicated
        "bias": jnp.zeros((256,)),      # replicated (1-D)
    }
    out = shard_params_tp(mesh, tree)
    assert out["big"].sharding.spec == P(None, "model")
    assert out["small"].sharding.spec == P()
    assert out["bias"].sharding.spec == P()


def _one_epoch_metrics(model, tx, variables, data, mesh, tp: bool):
    # fresh copies: the jitted train step donates its input state
    fresh = jax.tree_util.tree_map(jnp.array, variables)
    state = TrainState.create(fresh, tx)
    if mesh is not None:
        shard = shard_params_tp if tp else shard_replicated
        state = TrainState(
            params=shard(mesh, state.params),
            batch_stats=shard(mesh, state.batch_stats),
            opt_state=shard(mesh, state.opt_state),
            step=state.step,
        )
    step = make_train_step(model, tx)
    return run_train_epoch(
        step, state, data, 32, rnd.named_key(35, "d"), rnd.np_rng(35, "p"), mesh
    )[1]


def _toy_problem():
    model = build_model("smallcnn", 10, 224)
    tx = optax.adam(1e-3)
    rng = np.random.default_rng(7)
    n = 64
    feats = rng.standard_normal((n, 1, 32, 13)).astype(np.float32)
    labels = rng.integers(0, 10, n).astype(np.int64)
    data = ArraySet(feats, labels, np.zeros(n, np.int64))
    variables = model.init(jax.random.PRNGKey(0), feats[:1], train=False)
    return model, tx, data, variables


def test_dp_training_matches_single_device_metrics():
    """One epoch of 8-way data-parallel training must produce the same
    metrics (up to float association) as single-device on identical data."""
    model, tx, data, variables = _toy_problem()
    m_single = _one_epoch_metrics(model, tx, variables, data, None, tp=False)
    m_dp = _one_epoch_metrics(model, tx, variables, data, make_mesh(n_data=8, n_model=1), tp=False)
    assert abs(m_single["loss"] - m_dp["loss"]) < 1e-4
    assert m_single["mix_acc"] == m_dp["mix_acc"]


def test_tp_training_matches_single_device_metrics():
    """One epoch of dp=4 × tp=2 training (large dense kernels sharded on the
    'model' axis via shard_params_tp, GSPMD inserting the activation
    collectives) must reproduce the single-device metrics — the in-suite
    mirror of __graft_entry__.dryrun_multichip's layout."""
    model, tx, data, variables = _toy_problem()
    # Sanity: the layout actually shards something (dense kernel 224→128).
    mesh = make_mesh(n_data=4, n_model=2)
    placed = shard_params_tp(mesh, variables["params"])
    specs = {
        s.spec
        for s in jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda x: x.sharding, placed)
        )
    }
    assert P(None, "model") in specs, "TP layout sharded no kernels — test is vacuous"

    m_single = _one_epoch_metrics(model, tx, variables, data, None, tp=False)
    m_tp = _one_epoch_metrics(model, tx, variables, data, mesh, tp=True)
    assert abs(m_single["loss"] - m_tp["loss"]) < 1e-4
    assert m_single["mix_acc"] == m_tp["mix_acc"]
    assert m_single["asr"] == m_tp["asr"]
