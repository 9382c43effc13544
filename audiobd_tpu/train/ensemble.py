"""Vmapped ensemble training: K independent models in one compiled program.

A TPU-native capability with no reference counterpart. The reference trains
FlowMur's three surrogate models *sequentially* (reference
utils/flowmur_generate_trigger.py:15-47: three full early-stopped training
runs, one after another), and any seed/style sweep is likewise serial. The
KWS models here are tiny (~1-10 MFLOP/clip), so a single member leaves the
MXU mostly idle; vmapping the member axis over the device-resident scan
epoch (train/scan_epoch.py) turns K sequential runs into ONE program whose
per-step matmuls carry K× the rows — near-free parallel training on one
chip, and it composes with the data-parallel mesh for larger K.

Semantics: each member gets its own init key, its own dropout stream, and
its own shuffle permutation, so member i of the ensemble reproduces (to
float tolerance — vmap changes reduction grouping, not math) what a solo
scan-epoch run with the same keys would produce. Metric definitions are the
masked sums of train/scan_epoch.py, reported per member.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audiobd_tpu.train.scan_epoch import (
    eval_epoch_fn,
    make_perm,
    pad_plan,
    train_epoch_fn,
)
from audiobd_tpu.train.state import TrainState


def init_ensemble(model, tx: optax.GradientTransformation, example, keys) -> TrainState:
    """Stacked TrainState with a leading member axis K = len(keys).

    jitted: an unwrapped vmap still dispatches each batched primitive
    eagerly (~1 s/op cold over the axon tunnel); one program per call is
    the right cost for a once-per-run init."""

    def one(key):
        variables = model.init(key, example, train=False)
        return TrainState.create(variables, tx)

    return jax.jit(jax.vmap(one))(keys)


def member_state(states: TrainState, i: int) -> TrainState:
    """Extract member ``i`` as an ordinary (unstacked) TrainState."""
    return jax.tree_util.tree_map(lambda x: x[i], states)


def ensemble_size(states: TrainState) -> int:
    return int(jax.tree_util.tree_leaves(states.params)[0].shape[0])


def make_ensemble_train_epoch_fn(model, tx: optax.GradientTransformation, donate: bool = True):
    """jitted (states, feats, labels, indicators, perms, mask, keys) →
    (states, (K, n_batches) losses, (K, 4) metric sums).

    Data arrays are shared (broadcast) across members; states, permutations
    and PRNG keys carry the leading member axis.
    """
    epoch = train_epoch_fn(model, tx)
    batched = jax.vmap(epoch, in_axes=(0, None, None, None, 0, None, 0))
    return jax.jit(batched, donate_argnums=(0,) if donate else ())


def make_ensemble_eval_epoch_fn(model):
    """jitted (params_K, batch_stats_K, feats, labels, indicators, perm, mask)
    → ((K, n_batches) losses, (K, 4) metric sums). One shared eval order."""
    epoch = eval_epoch_fn(model)
    batched = jax.vmap(epoch, in_axes=(0, 0, None, None, None, None, None))
    return jax.jit(batched)


def stack_perms(np_rngs, n: int, batch_size: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(K, n_batches, bs) per-member permutations + shared (n_batches, bs) mask."""
    n_batches, mask = pad_plan(n, batch_size)
    perms = np.stack([make_perm(r, n, n_batches, batch_size) for r in np_rngs])
    return jnp.asarray(perms), jnp.asarray(mask)


@jax.jit
def _select_improved(best: TrainState, new: TrainState, improved: jax.Array) -> TrainState:
    """Per-member best-state update: where improved[k], take new member k.

    Produces fresh buffers (jnp.where), so the result survives donation of
    ``new`` by the next train-epoch call.
    """

    def sel(b, n):
        cond = improved.reshape(improved.shape + (1,) * (n.ndim - 1))
        return jnp.where(cond, n, b)

    return jax.tree_util.tree_map(sel, best, new)


def run_ensemble_train_epoch(epoch_fn, states, dset, batch_size, keys, np_rngs):
    """One vmapped train epoch; returns (states, per-member metric dict)."""
    perms, mask = stack_perms(np_rngs, dset.n, batch_size)
    states, losses, sums = epoch_fn(
        states, dset.feats, dset.labels, dset.indicators, perms, mask, keys
    )
    losses = np.asarray(jax.device_get(losses))
    sums = np.asarray(jax.device_get(sums))
    return states, {
        "loss": losses.mean(axis=1),
        "mix_acc": 100.0 * sums[:, 0] / np.maximum(sums[:, 1], 1),
        "asr": 100.0 * sums[:, 2] / np.maximum(sums[:, 3], 1),
    }


def run_ensemble_eval(eval_fn, states, dset, batch_size):
    """Shared-order eval of every member; per-member metric dict of (K,)."""
    n_batches, mask = pad_plan(dset.n, batch_size)
    perm = jnp.asarray(make_perm(None, dset.n, n_batches, batch_size))
    losses, sums = eval_fn(
        states.params, states.batch_stats, dset.feats, dset.labels,
        dset.indicators, perm, jnp.asarray(mask),
    )
    losses = np.asarray(jax.device_get(losses))
    sums = np.asarray(jax.device_get(sums))
    return {
        "loss": losses.mean(axis=1),
        "acc": 100.0 * sums[:, 0] / np.maximum(sums[:, 1], 1),
        "asr": 100.0 * sums[:, 2] / np.maximum(sums[:, 3], 1),
    }


def train_ensemble(
    model,
    tx: optax.GradientTransformation,
    train_set,
    val_set,
    init_keys,
    shuffle_rngs,
    *,
    batch_size: int,
    max_epochs: int,
    patience: int = 20,
    min_delta: float = 0.0,
    verbose: bool = False,
) -> tuple[TrainState, dict]:
    """Early-stopped parallel training of K members; returns the stacked
    per-member BEST states (lowest val loss, patience semantics matching
    train/loop.py::EarlyStopping per member) and a history dict.

    Training continues until every member has exhausted its patience or
    ``max_epochs`` is reached; members that already stopped keep training
    (their compute is free — same program) but their best snapshot freezes.
    """
    from audiobd_tpu.train.scan_epoch import DeviceDataset

    k = len(init_keys)
    assert len(shuffle_rngs) == k
    train_dev = train_set if isinstance(train_set, DeviceDataset) else DeviceDataset(train_set)
    val_dev = val_set if isinstance(val_set, DeviceDataset) else DeviceDataset(val_set)

    states = init_ensemble(model, tx, jnp.asarray(train_dev.feats[:1]), jnp.stack(init_keys))
    epoch_fn = make_ensemble_train_epoch_fn(model, tx)
    eval_fn = make_ensemble_eval_epoch_fn(model)

    best = jax.tree_util.tree_map(jnp.copy, states)
    best_loss = np.full((k,), np.inf)
    counters = np.zeros((k,), np.int64)
    stopped = np.zeros((k,), bool)
    history = {"val_loss": [], "val_acc": [], "epochs_to_best": np.zeros((k,), np.int64)}

    for epoch in range(1, max_epochs + 1):
        states, _ = run_ensemble_train_epoch(
            epoch_fn, states, train_dev, batch_size, jnp.stack(init_keys), shuffle_rngs
        )
        ev = run_ensemble_eval(eval_fn, states, val_dev, batch_size)
        improved = (ev["loss"] < best_loss - min_delta) & ~stopped
        best = _select_improved(best, states, jnp.asarray(improved))
        best_loss = np.where(improved, ev["loss"], best_loss)
        history["epochs_to_best"] = np.where(improved, epoch, history["epochs_to_best"])
        counters = np.where(improved, 0, counters + 1)
        stopped |= counters >= patience
        history["val_loss"].append(ev["loss"])
        history["val_acc"].append(ev["acc"])
        if verbose and epoch % 10 == 0:
            print(f"ensemble epoch {epoch}: val acc {np.round(ev['acc'], 2)}"
                  f" stopped {int(stopped.sum())}/{k}")
        if stopped.all():
            break
    history["val_loss"] = np.stack(history["val_loss"])
    history["val_acc"] = np.stack(history["val_acc"])
    return best, history
