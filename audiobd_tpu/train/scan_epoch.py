"""Device-resident epoch execution: one lax.scan per epoch.

The per-batch path (train/loop.py) device_puts every batch from host numpy
and pays a Python dispatch per step — the dominant wall-clock cost for these
small models (the TPU step itself is ~0.2 ms). Speech Commands MFCCs fit in
HBM with room to spare (~650 MB fp32 at 40 k clips), so the whole dataset
lives on device and an epoch is a single compiled program:

    scan over (n_batches) of: gather batch by permuted indices → train step

Metric semantics are identical to the per-batch path (masked sums +
batch-mean losses), asserted by tests.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audiobd_tpu.train.loop import _apply, cross_entropy
from audiobd_tpu.train.state import TrainState


def pad_plan(n: int, batch_size: int) -> tuple[int, np.ndarray]:
    """(n_batches, mask (n_batches, batch_size)) with wrap-padded tail."""
    n_batches = -(-n // batch_size)
    mask = np.ones((n_batches, batch_size), dtype=bool)
    tail = n_batches * batch_size - n
    if tail:
        mask[-1, batch_size - tail :] = False
    return n_batches, mask


def make_perm(np_rng: np.random.Generator | None, n: int, n_batches: int, batch_size: int) -> np.ndarray:
    order = np_rng.permutation(n) if np_rng is not None else np.arange(n)
    total = n_batches * batch_size
    if total > n:
        # Cyclic wrap-pad (same as iter_batches): handles batch_size > n,
        # where a single slice of the permutation would fall short.
        order = np.concatenate([order, np.resize(order, total - n)])
    return order.reshape(n_batches, batch_size).astype(np.int32)


def train_epoch_fn(model, tx: optax.GradientTransformation):
    """Pure (state, feats, labels, indicators, perm, mask, key) →
    (state, per-batch losses, metric sums). Jitted by make_train_epoch_fn;
    vmapped over a member axis by train/ensemble.py."""

    def epoch(state: TrainState, feats, labels, indicators, perm, mask, key):
        def body(carry, inputs):
            state = carry
            idx, bmask, step_key = inputs
            batch_x = feats[idx]
            batch_y = labels[idx]
            batch_ind = indicators[idx]

            def loss_fn(params):
                logits, mut = _apply(model, params, state.batch_stats, batch_x, True, step_key)
                per_row = cross_entropy(logits, batch_y)
                fm = bmask.astype(jnp.float32)
                loss = jnp.sum(per_row * fm) / jnp.maximum(jnp.sum(fm), 1.0)
                return loss, (logits, mut["batch_stats"])

            (loss, (logits, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_state = dataclasses.replace(
                state,
                params=optax.apply_updates(state.params, updates),
                batch_stats=new_stats,
                opt_state=new_opt,
                step=state.step + 1,
            )
            pred = jnp.argmax(logits, axis=-1)
            hit = (pred == batch_y) & bmask
            poison = (batch_ind == 1) & bmask
            stats = jnp.asarray(
                [jnp.sum(hit), jnp.sum(bmask), jnp.sum(hit & poison), jnp.sum(poison)],
                jnp.int32,
            )
            return new_state, (loss, stats)

        n_batches = perm.shape[0]
        step_keys = jax.random.split(jax.random.fold_in(key, state.step), n_batches)
        state, (losses, stats) = jax.lax.scan(body, state, (perm, mask, step_keys))
        sums = jnp.sum(stats, axis=0)
        return state, losses, sums

    return epoch


def make_train_epoch_fn(model, tx: optax.GradientTransformation, donate: bool = True):
    """jitted (state, feats, labels, indicators, perm, mask, key) →
    (state, per-batch losses, metric sums)."""
    return jax.jit(train_epoch_fn(model, tx), donate_argnums=(0,) if donate else ())


def eval_epoch_fn(model):
    """Pure (params, batch_stats, feats, labels, indicators, perm, mask) →
    (per-batch losses, metric sums)."""

    def epoch(params, batch_stats, feats, labels, indicators, perm, mask):
        def body(carry, inputs):
            idx, bmask = inputs
            logits, _ = _apply(model, params, batch_stats, feats[idx], False)
            per_row = cross_entropy(logits, labels[idx])
            fm = bmask.astype(jnp.float32)
            loss = jnp.sum(per_row * fm) / jnp.maximum(jnp.sum(fm), 1.0)
            pred = jnp.argmax(logits, axis=-1)
            hit = (pred == labels[idx]) & bmask
            poison = (indicators[idx] == 1) & bmask
            stats = jnp.asarray(
                [jnp.sum(hit), jnp.sum(bmask), jnp.sum(hit & poison), jnp.sum(poison)],
                jnp.int32,
            )
            return carry, (loss, stats)

        _, (losses, stats) = jax.lax.scan(body, None, (perm, mask))
        return losses, jnp.sum(stats, axis=0)

    return epoch


def make_eval_epoch_fn(model):
    """jitted (params, batch_stats, feats, labels, indicators, perm, mask) →
    (per-batch losses, metric sums)."""
    return jax.jit(eval_epoch_fn(model))


@jax.jit
def _to_nhwc_once(feats):
    # jitted so the one-time relayout is a single compiled program (an eager
    # transpose costs a fresh remote compile per shape over the axon tunnel)
    return jnp.transpose(feats, (0, 2, 3, 1))


class DeviceDataset:
    """An ArraySet pinned to device memory for scan epochs."""

    def __init__(self, data, sharding=None, layout: str = "nchw"):
        put = partial(jax.device_put, device=sharding) if sharding is not None else jax.device_put
        feats = jnp.asarray(data.feats, jnp.float32)
        if layout == "nhwc" and feats.ndim == 4:
            # One-time relayout at adoption: batch gathers then emit NHWC
            # directly and the models skip their per-step transpose
            # (TrainConfig.feature_layout; models' input_layout must match).
            feats = _to_nhwc_once(feats)
        self.feats = put(feats)
        self.labels = put(jnp.asarray(data.labels, jnp.int32))
        ind = data.indicators if data.indicators is not None else np.zeros(len(data.labels), np.int64)
        self.indicators = put(jnp.asarray(ind, jnp.int32))
        self.n = len(data.labels)

    def __len__(self):
        return self.n


def run_train_epoch_scan(epoch_fn, state, dset: DeviceDataset, batch_size, key, np_rng):
    n_batches, mask = pad_plan(dset.n, batch_size)
    perm = make_perm(np_rng, dset.n, n_batches, batch_size)
    state, losses, sums = epoch_fn(
        state, dset.feats, dset.labels, dset.indicators,
        jnp.asarray(perm), jnp.asarray(mask), key,
    )
    losses = np.asarray(jax.device_get(losses))
    sums = np.asarray(jax.device_get(sums))
    out = {
        "loss": float(losses.mean()),
        "mix_acc": 100.0 * sums[0] / max(sums[1], 1),
        "asr": 100.0 * sums[2] / max(sums[3], 1),
    }
    return state, out


def run_eval_scan(eval_fn, state, dset: DeviceDataset, batch_size):
    n_batches, mask = pad_plan(dset.n, batch_size)
    perm = make_perm(None, dset.n, n_batches, batch_size)
    losses, sums = eval_fn(
        state.params, state.batch_stats, dset.feats, dset.labels, dset.indicators,
        jnp.asarray(perm), jnp.asarray(mask),
    )
    losses = np.asarray(jax.device_get(losses))
    sums = np.asarray(jax.device_get(sums))
    return {
        "loss": float(losses.mean()),
        "acc": 100.0 * sums[0] / max(sums[1], 1),
        "asr": 100.0 * sums[2] / max(sums[3], 1),
    }


# ---------------------------------------------------------------------------
# Sharded (multi-chip data-parallel) scan epochs
#
# The single-device scan epoch keeps the whole dataset in HBM and runs one
# compiled program per epoch. On a mesh, the per-batch path would reintroduce
# a host dispatch per step; instead the dataset is row-sharded over the
# 'data' axis and the same scan runs under shard_map: each device shuffles
# its local shard, a global batch is the concatenation of per-device slices,
# and loss/gradients/metric sums are psum'd. BatchNorm syncs batch statistics
# over the axis (models' ``bn_axis``), so one step is numerically the
# per-batch GSPMD step — global-batch semantics, no per-batch host dispatch.
# (SURVEY.md §2.5: DP over ICI is the production layout for these models.)


def shard_layout(n: int, n_devices: int) -> tuple[int, np.ndarray, np.ndarray]:
    """(n_loc, offsets, counts): balanced contiguous row assignment.

    Shard d owns rows [offsets[d], offsets[d]+counts[d]) of the original
    array, with counts differing by at most one — no shard is ever empty for
    n >= D (a ceil-based split would leave trailing shards empty for small
    n, e.g. 33 rows on 8 chips). Each shard's rows are wrap-padded to the
    common n_loc slot size the mesh sharding requires."""
    d = n_devices
    assert n >= d, f"need at least one row per shard: n={n}, devices={d}"
    base, extra = divmod(n, d)
    counts = np.asarray([base + (1 if i < extra else 0) for i in range(d)])
    offsets = np.concatenate([[0], np.cumsum(counts[:-1])])
    return int(counts.max()), offsets, counts


def make_sharded_perm(
    np_rng: np.random.Generator | None, n: int, n_devices: int, batch_size: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Per-shard local shuffle plan.

    Rows are assigned by shard_layout; returns (perm (n_batches, D, B/D) of
    LOCAL indices, mask (n_batches, D, B/D), n_padded). Wrap-padded slots
    are masked out, so each real row contributes to the epoch metrics
    exactly once. Shuffling is within-shard (the standard per-host input
    pipeline) — batch composition differs from a global shuffle, per-step
    math does not.
    """
    d = n_devices
    assert batch_size % d == 0, (batch_size, d)
    b_loc = batch_size // d
    n_loc, _, counts = shard_layout(n, d)
    n_batches = -(-n_loc // b_loc)
    cap = n_batches * b_loc
    perms, masks = [], []
    for dev in range(d):
        real = int(counts[dev])
        order = np_rng.permutation(real) if np_rng is not None else np.arange(real)
        order = np.resize(order, cap)
        mask = np.zeros(cap, dtype=bool)
        mask[:real] = True
        perms.append(order.reshape(n_batches, b_loc))
        masks.append(mask.reshape(n_batches, b_loc))
    perm = np.stack(perms, axis=1).astype(np.int32)
    mask = np.stack(masks, axis=1)
    return perm, mask, n_loc * d


def pad_rows_index(n: int, n_devices: int) -> np.ndarray:
    """Flat row indices of the shard_layout slot grid: shard d's slot block
    holds its counts[d] real rows wrap-padded to n_loc."""
    n_loc, offsets, counts = shard_layout(n, n_devices)
    return np.concatenate(
        [off + (np.arange(n_loc) % int(cnt)) for off, cnt in zip(offsets, counts)]
    )


def pad_rows(arr: np.ndarray, n_devices: int) -> np.ndarray:
    """Rearrange rows into the shard_layout slot grid (padded copies are
    never emitted by make_sharded_perm's masks)."""
    return arr[pad_rows_index(arr.shape[0], n_devices)]


def _with_bn_axis(model, axis_name: str):
    if "bn_axis" in getattr(model, "__dataclass_fields__", {}):
        return model.clone(bn_axis=axis_name)
    return model


def make_sharded_train_epoch_fn(model, tx: optax.GradientTransformation, mesh):
    """jitted (state, feats, labels, indicators, perm, mask, key) →
    (state, per-batch global losses, global metric sums) over the mesh's
    'data' axis. feats/labels/indicators must be sharded on rows (dim 0) and
    row-padded to the shard grid; perm/mask come from make_sharded_perm.
    """
    from jax.sharding import PartitionSpec as P

    model = _with_bn_axis(model, "data")

    def epoch(state: TrainState, feats, labels, indicators, perm, mask, key):
        perm = perm[:, 0]  # (n_batches, B/D) local plan
        mask = mask[:, 0]
        dev = jax.lax.axis_index("data")

        def body(carry, inputs):
            state = carry
            idx, bmask, step_key = inputs
            step_key = jax.random.fold_in(step_key, dev)  # per-device dropout
            batch_x = feats[idx]
            batch_y = labels[idx]
            batch_ind = indicators[idx]

            def loss_fn(params):
                logits, mut = _apply(model, params, state.batch_stats, batch_x, True, step_key)
                per_row = cross_entropy(logits, batch_y)
                fm = bmask.astype(jnp.float32)
                num = jax.lax.psum(jnp.sum(per_row * fm), "data")
                den = jax.lax.psum(jnp.sum(fm), "data")
                loss = num / jnp.maximum(den, 1.0)
                return loss, (logits, mut["batch_stats"])

            (loss, (logits, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            # loss_fn's local gradient covers only this shard's numerator
            # terms; the sum over shards is the global-batch gradient.
            grads = jax.lax.psum(grads, "data")
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_state = dataclasses.replace(
                state,
                params=optax.apply_updates(state.params, updates),
                batch_stats=new_stats,
                opt_state=new_opt,
                step=state.step + 1,
            )
            pred = jnp.argmax(logits, axis=-1)
            hit = (pred == batch_y) & bmask
            poison = (batch_ind == 1) & bmask
            stats = jnp.asarray(
                [jnp.sum(hit), jnp.sum(bmask), jnp.sum(hit & poison), jnp.sum(poison)],
                jnp.int32,
            )
            return new_state, (loss, jax.lax.psum(stats, "data"))

        n_batches = perm.shape[0]
        step_keys = jax.random.split(jax.random.fold_in(key, state.step), n_batches)
        state, (losses, stats) = jax.lax.scan(body, state, (perm, mask, step_keys))
        return state, losses, jnp.sum(stats, axis=0)

    sharded = jax.shard_map(
        epoch,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P(None, "data"), P(None, "data"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_eval_epoch_fn(model, mesh):
    """jitted sharded (params, batch_stats, feats, labels, indicators, perm,
    mask) → (per-batch global losses, global metric sums)."""
    from jax.sharding import PartitionSpec as P

    def epoch(params, batch_stats, feats, labels, indicators, perm, mask):
        perm = perm[:, 0]
        mask = mask[:, 0]

        def body(carry, inputs):
            idx, bmask = inputs
            logits, _ = _apply(model, params, batch_stats, feats[idx], False)
            per_row = cross_entropy(logits, labels[idx])
            fm = bmask.astype(jnp.float32)
            num = jax.lax.psum(jnp.sum(per_row * fm), "data")
            den = jax.lax.psum(jnp.sum(fm), "data")
            loss = num / jnp.maximum(den, 1.0)
            pred = jnp.argmax(logits, axis=-1)
            hit = (pred == labels[idx]) & bmask
            poison = (indicators[idx] == 1) & bmask
            stats = jnp.asarray(
                [jnp.sum(hit), jnp.sum(bmask), jnp.sum(hit & poison), jnp.sum(poison)],
                jnp.int32,
            )
            return carry, (loss, jax.lax.psum(stats, "data"))

        _, (losses, stats) = jax.lax.scan(body, None, (perm, mask))
        return losses, jnp.sum(stats, axis=0)

    sharded = jax.shard_map(
        epoch,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P("data"), P(None, "data"), P(None, "data")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


class ShardedDeviceDataset:
    """Dataset row-sharded over the mesh 'data' axis (wrap-padded to the
    shard grid; padded rows are never emitted by make_sharded_perm)."""

    def __init__(self, data, mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.d = mesh.shape["data"]
        self.n = len(data.labels)
        sh = NamedSharding(mesh, P("data"))
        ind = data.indicators if data.indicators is not None else np.zeros(self.n, np.int64)

        def shard(arr, dtype):
            if isinstance(arr, jax.Array):
                # device-resident input (the poisoning preps): rearrange with
                # one device gather and reshard device-to-device — never pull
                # the split through the (bandwidth-bound) host link.
                idx = jnp.asarray(pad_rows_index(arr.shape[0], self.d))
                return jax.device_put(jnp.take(arr.astype(dtype), idx, axis=0), sh)
            return jax.device_put(jnp.asarray(pad_rows(np.asarray(arr, dtype), self.d)), sh)

        self.feats = shard(data.feats, jnp.float32)
        self.labels = shard(data.labels, jnp.int32)
        self.indicators = shard(ind, jnp.int32)

    def __len__(self):
        return self.n


def run_train_epoch_sharded(epoch_fn, state, dset: ShardedDeviceDataset, batch_size, key, np_rng):
    perm, mask, _ = make_sharded_perm(np_rng, dset.n, dset.d, batch_size)
    state, losses, sums = epoch_fn(
        state, dset.feats, dset.labels, dset.indicators,
        jnp.asarray(perm), jnp.asarray(mask), key,
    )
    losses = np.asarray(jax.device_get(losses))
    sums = np.asarray(jax.device_get(sums))
    out = {
        "loss": float(losses.mean()),
        "mix_acc": 100.0 * sums[0] / max(sums[1], 1),
        "asr": 100.0 * sums[2] / max(sums[3], 1),
    }
    return state, out


def run_eval_sharded(eval_fn, state, dset: ShardedDeviceDataset, batch_size):
    perm, mask, _ = make_sharded_perm(None, dset.n, dset.d, batch_size)
    losses, sums = eval_fn(
        state.params, state.batch_stats, dset.feats, dset.labels, dset.indicators,
        jnp.asarray(perm), jnp.asarray(mask),
    )
    losses = np.asarray(jax.device_get(losses))
    sums = np.asarray(jax.device_get(sums))
    return {
        "loss": float(losses.mean()),
        "acc": 100.0 * sums[0] / max(sums[1], 1),
        "asr": 100.0 * sums[2] / max(sums[3], 1),
    }
