"""Jitted train/eval steps + the epoch engine.

Reference semantics reproduced (utils/training_tools.py:52-134):
  * train metrics — batch-mean CE loss averaged over batches, mixed accuracy
    over all rows, train-ASR = target-hit-rate over poison_indicator==1 rows
    (their labels are already flipped to the target).
  * test — clean accuracy over the clean loader; ASR over indicator==1 rows
    of the backdoored loader; losses as mean of batch means.

TPU-first differences (not a port):
  * one jitted step; metrics are computed on-device as masked sums and only
    fetched at epoch end (the reference syncs `.item()` every batch,
    utils/training_tools.py:71).
  * every batch has a static shape: the final partial batch is wrap-padded
    with leading rows and masked out of loss/metrics — no recompilation,
    and BN statistics see real data rather than zeros.
  * batches are sharded over the mesh's 'data' axis; GSPMD turns the masked
    global mean into a psum over ICI.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Callable
from functools import partial


import jax
import jax.numpy as jnp
import numpy as np
import optax

from audiobd_tpu.parallel.mesh import shard_batch
from audiobd_tpu.train.state import TrainState


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    # Loss always in float32 regardless of the model's compute dtype.
    return optax.softmax_cross_entropy_with_integer_labels(logits.astype(jnp.float32), labels)


def _apply(model, params, batch_stats, x, train, dropout_key=None):
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        return model.apply(
            variables, x, train=True, rngs={"dropout": dropout_key}, mutable=["batch_stats"]
        )
    return model.apply(variables, x, train=False), None


def make_train_step(model, tx: optax.GradientTransformation) -> Callable:
    """Returns jitted (state, batch, key) → (state, metric-sums)."""

    def step(state: TrainState, batch: dict[str, jax.Array], key: jax.Array):
        key = jax.random.fold_in(key, state.step)

        def loss_fn(params):
            logits, mut = _apply(model, params, state.batch_stats, batch["x"], True, key)
            per_row = cross_entropy(logits, batch["y"])
            mask = batch["mask"].astype(jnp.float32)
            loss = jnp.sum(per_row * mask) / jnp.maximum(jnp.sum(mask), 1.0)
            return loss, (logits, mut["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = dataclasses.replace(
            state,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
        )

        pred = jnp.argmax(logits, axis=-1)
        mask = batch["mask"]
        hit = (pred == batch["y"]) & mask
        poison = (batch["indicator"] == 1) & mask
        metrics = {
            "loss_batchmean": loss,
            "correct": jnp.sum(hit),
            "total": jnp.sum(mask),
            "asr_correct": jnp.sum(hit & poison),
            "poison_total": jnp.sum(poison),
        }
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(model) -> Callable:
    """Returns jitted (params, batch_stats, batch) → metric-sums."""

    def step(params, batch_stats, batch):
        logits, _ = _apply(model, params, batch_stats, batch["x"], False)
        per_row = cross_entropy(logits, batch["y"])
        mask = batch["mask"]
        fmask = mask.astype(jnp.float32)
        loss = jnp.sum(per_row * fmask) / jnp.maximum(jnp.sum(fmask), 1.0)
        pred = jnp.argmax(logits, axis=-1)
        hit = (pred == batch["y"]) & mask
        poison = (batch["indicator"] == 1) & mask
        return {
            "loss_batchmean": loss,
            "correct": jnp.sum(hit),
            "total": jnp.sum(mask),
            "asr_correct": jnp.sum(hit & poison),
            "poison_total": jnp.sum(poison),
        }

    return jax.jit(step)


# ---------------------------------------------------------------------------
# Host-side batching


def iter_batches(
    n: int,
    batch_size: int,
    rng: np.random.Generator | None = None,
    shuffle: bool = True,
):
    """Yield (index_array, mask_array) of fixed length batch_size.

    The final partial batch is wrap-padded from the permutation's start and
    the pad rows masked out.
    """
    order = rng.permutation(n) if shuffle and rng is not None else np.arange(n)
    for start in range(0, n, batch_size):
        idx = order[start : start + batch_size]
        mask = np.ones(len(idx), dtype=bool)
        if len(idx) < batch_size:
            pad = batch_size - len(idx)
            idx = np.concatenate([idx, order[:pad] if n >= pad else np.resize(order, pad)])
            mask = np.concatenate([mask, np.zeros(pad, dtype=bool)])
        yield idx, mask


def make_batch(
    feats: np.ndarray,
    labels: np.ndarray,
    indicators: np.ndarray | None,
    idx: np.ndarray,
    mask: np.ndarray,
) -> dict[str, np.ndarray]:
    return {
        "x": feats[idx].astype(np.float32),
        "y": labels[idx].astype(np.int32),
        "indicator": (
            indicators[idx].astype(np.int32) if indicators is not None else np.zeros(len(idx), np.int32)
        ),
        "mask": mask,
    }


# ---------------------------------------------------------------------------
# Epoch-level API


@dataclasses.dataclass
class ArraySet:
    """A dataset slice as dense arrays — host numpy or device-resident
    jax.Array feats (the poisoning preps return device arrays so
    DeviceDataset adopts them with no host round trip)."""

    feats: np.ndarray        # (N, 1, frames, n_mfcc)
    labels: np.ndarray       # (N,)
    indicators: np.ndarray | None = None  # (N,) 1 where poisoned

    def __len__(self):
        return len(self.feats)


def run_train_epoch(train_step, state, data: ArraySet, batch_size, key, np_rng, mesh=None):
    sums = {"correct": 0, "total": 0, "asr_correct": 0, "poison_total": 0}
    losses = []
    for idx, mask in iter_batches(len(data), batch_size, np_rng, shuffle=True):
        batch = make_batch(data.feats, data.labels, data.indicators, idx, mask)
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        state, metrics = train_step(state, batch, key)
        losses.append(metrics["loss_batchmean"])
        for k in sums:
            sums[k] = sums[k] + metrics[k]
    # Single host sync per epoch.
    losses = [float(v) for v in jax.device_get(losses)]
    sums = {k: int(v) for k, v in jax.device_get(sums).items()}
    out = {
        "loss": float(np.mean(losses)),
        "mix_acc": 100.0 * sums["correct"] / max(sums["total"], 1),
        "asr": 100.0 * sums["asr_correct"] / max(sums["poison_total"], 1),
    }
    return state, out


def run_eval(eval_step, state, data: ArraySet, batch_size, mesh=None):
    sums = {"correct": 0, "total": 0, "asr_correct": 0, "poison_total": 0}
    losses = []
    for idx, mask in iter_batches(len(data), batch_size, shuffle=False):
        batch = make_batch(data.feats, data.labels, data.indicators, idx, mask)
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        metrics = eval_step(state.params, state.batch_stats, batch)
        losses.append(metrics["loss_batchmean"])
        for k in sums:
            sums[k] = sums[k] + metrics[k]
    losses = [float(v) for v in jax.device_get(losses)]
    sums = {k: int(v) for k, v in jax.device_get(sums).items()}
    return {
        "loss": float(np.mean(losses)),
        "acc": 100.0 * sums["correct"] / max(sums["total"], 1),
        "asr": 100.0 * sums["asr_correct"] / max(sums["poison_total"], 1),
    }


class EarlyStopping:
    """Patience-based early stopping (reference utils/training_tools.py:4-50).

    ``save_fn`` is invoked with the current state whenever the monitored loss
    improves — the checkpoint holds the *best* model, which the defenses load.
    """

    def __init__(self, patience: int = 20, delta: float = 0.0, save_fn=None, verbose: bool = True):
        self.patience = patience
        self.delta = delta
        self.save_fn = save_fn
        self.verbose = verbose
        self.best: float | None = None
        self.counter = 0
        self.should_stop = False

    def __call__(self, value: float, state=None) -> bool:
        improved = self.best is None or value < self.best - self.delta
        if improved:
            self.best = value
            self.counter = 0
            if self.save_fn is not None:
                self.save_fn(state)
        else:
            self.counter += 1
            if self.verbose:
                print(f"EarlyStopping counter: {self.counter} out of {self.patience}")
            if self.counter >= self.patience:
                self.should_stop = True
        return self.should_stop
