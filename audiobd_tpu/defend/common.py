"""Shared defense infrastructure.

Every reference defense (fp.py:87-125, ft_reg.py:200-248, tsbd.py:220-266)
starts the same way: load the cached clean/bd npys, carve a 5% validation
split out of clean-train, and un-pickle ``checkpoint.pt``. Here that is one
function over the Orbax checkpoint + npy contract, plus pytree utilities for
neuron-level surgery (the defenses' core primitive) that the reference does
via state_dict mutation.

Layer/neuron naming: a "neuron" is an output channel — the last axis of a
flax conv kernel (kh, kw, in, out) or dense kernel (in, out). Names are
'/'-joined param paths, stable across save/restore.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audiobd_tpu.configs import AttackConfig
from audiobd_tpu.models import build_model
from audiobd_tpu.train.checkpoint import load_checkpoint
from audiobd_tpu.train.loop import ArraySet
from audiobd_tpu.utils import random as rnd


@dataclass
class DefenseData:
    clean_val: ArraySet
    clean_test: ArraySet
    bd_test: ArraySet            # labels all target; used for raw "asr-as-acc"
    bd_test_complete: ArraySet   # with poison indicators (for true ASR)


def load_defense_data(cfg: AttackConfig, val_ratio: float = 0.05) -> DefenseData:
    clean_path = os.path.join(cfg.record_dir, cfg.dataset, "clean")
    bd_path = os.path.join(cfg.record_dir, cfg.dataset, "bd")
    c_tr_m = np.load(os.path.join(clean_path, "clean_train_mfcc.npy"))
    c_tr_y = np.load(os.path.join(clean_path, "clean_train_label.npy"))
    c_te_m = np.load(os.path.join(clean_path, "clean_test_mfcc.npy"))
    c_te_y = np.load(os.path.join(clean_path, "clean_test_label.npy"))
    b_te_m = np.load(os.path.join(bd_path, "bd_test_mfcc.npy"))
    b_te_y = np.load(os.path.join(bd_path, "bd_test_label.npy"))
    b_te_i = np.load(os.path.join(bd_path, "poison_index_test.npy"))

    rng = rnd.np_rng(cfg.train.seed, "defense_val")
    val_idx = rng.choice(len(c_tr_m), size=int(len(c_tr_m) * val_ratio), replace=False)
    return DefenseData(
        clean_val=ArraySet(c_tr_m[val_idx], c_tr_y[val_idx]),
        clean_test=ArraySet(c_te_m, c_te_y),
        bd_test=ArraySet(b_te_m, b_te_y),
        bd_test_complete=ArraySet(b_te_m, b_te_y, b_te_i),
    )


def load_bd_model(cfg: AttackConfig):
    """Rebuild the attacked model + best-checkpoint variables.

    Deliberately unfused: checkpoints interoperate either way (identical
    param trees), but defense chains are compile-dominated — dozens of
    short-lived programs (vmapped sweeps, per-ratio fine-tunes) where the
    Pallas custom_vjp's extra compile time costs more than its runtime win
    (measured: FP 3m11→9m53, TSBD 11m37→15m41 with fused on)."""
    tree, spec = load_checkpoint(cfg.record_dir)
    model = build_model(
        spec["model"], spec["num_classes"], spec["feature_size"], n_mfcc=spec.get("n_mfcc")
    )
    variables = {"params": tree["params"], "batch_stats": tree.get("batch_stats", {})}
    return model, variables, spec


# ---------------------------------------------------------------------------
# Pytree neuron surgery


def _walk(tree: dict, path: tuple = ()):
    for key, value in tree.items():
        if isinstance(value, dict):
            yield from _walk(value, path + (key,))
        else:
            yield path + (key,), value


def layer_kernels(params: dict, kind: str = "conv") -> list[tuple[str, np.ndarray]]:
    """Named conv (ndim 4) or dense (ndim 2) kernels in traversal order."""
    want_ndim = 4 if kind == "conv" else 2
    out = []
    for path, leaf in _walk(params):
        if path[-1] == "kernel" and np.ndim(leaf) == want_ndim:
            out.append(("/".join(path), leaf))
    return out


def get_leaf(params: dict, name: str):
    node = params
    for key in name.split("/"):
        node = node[key]
    return node


def set_leaf(params: dict, name: str, value) -> dict:
    """Functional update of one leaf (returns a new tree)."""
    keys = name.split("/")

    def rec(node, i):
        out = dict(node)
        if i == len(keys) - 1:
            out[keys[i]] = value
        else:
            out[keys[i]] = rec(node[keys[i]], i + 1)
        return out

    return rec(params, 0)


def zero_neuron(params: dict, layer_name: str, idx: int) -> dict:
    """Zero output-channel ``idx`` of a kernel (weights only, like the
    reference's state_dict[layer][idx] = 0 on torch (out, ...) weights).

    Host numpy on purpose: eager device scatters here compile one program
    per unique index shape (~30-70 s each over a remote-attached chip)."""
    kernel = np.array(get_leaf(params, layer_name))  # host copy
    kernel[..., idx] = 0.0
    return set_leaf(params, layer_name, kernel)


def zero_neurons(params: dict, neuron_list: list[tuple[str, int]]) -> dict:
    by_layer: dict[str, list[int]] = {}
    for layer, idx in neuron_list:
        by_layer.setdefault(layer, []).append(idx)
    for layer, idxs in by_layer.items():
        kernel = np.array(get_leaf(params, layer))  # host copy
        kernel[..., np.asarray(idxs)] = 0.0
        params = set_leaf(params, layer, kernel)
    return params


def neuron_names(params: dict, kind: str = "conv") -> list[tuple[str, int]]:
    out = []
    for name, kernel in layer_kernels(params, kind):
        for idx in range(kernel.shape[-1]):
            out.append((name, idx))
    return out


def neuron_weight_norms(params: dict, kind: str = "conv") -> tuple[list[float], list[tuple[str, int]]]:
    """L2 norm of each output-channel's weights (reference
    get_neuron_weight_norm, ft_reg.py:144-161)."""
    norms, names = [], []
    for name, kernel in layer_kernels(params, kind):
        k = np.asarray(kernel).reshape(-1, kernel.shape[-1])
        for idx in range(kernel.shape[-1]):
            names.append((name, idx))
            norms.append(float(np.linalg.norm(k[:, idx])))
    return norms, names


def neuron_weight_changes(params_new: dict, params_old: dict, kind: str = "conv"):
    """Per-neuron summed |Δw| and per-weight |Δw| lists (TSBD's NWC,
    tsbd.py:345-358). Returns (list[(layer, idx, nwc)], {name→|Δw| vector})."""
    nwc = []
    n2w = {}
    old = {name: kern for name, kern in layer_kernels(params_old, kind)}
    for name, kernel in layer_kernels(params_new, kind):
        delta = np.abs(np.asarray(kernel) - np.asarray(old[name]))
        flat = delta.reshape(-1, delta.shape[-1])
        for idx in range(delta.shape[-1]):
            nwc.append((name, idx, float(flat[:, idx].sum())))
            n2w[f"{name}.{idx}"] = flat[:, idx].tolist()
    return nwc, n2w


# ---------------------------------------------------------------------------
# Eval / fine-tune wrappers (device-resident scan epochs)
#
# Defense loops run hundreds of epochs over small splits; the per-batch path
# pays a host dispatch + device_put per step, which dominated the round-1
# defense-chain wall time (CLAUDE.md deferred item). All defense eval and
# fine-tuning now runs on train/scan_epoch.py's engine: datasets are pinned
# to device once (cached per ArraySet) and each epoch is one compiled scan.


_device_cache: dict[int, tuple[Any, Any]] = {}


def device_dataset(data: ArraySet):
    """Device-resident view of an ArraySet, cached by identity (weakref-
    verified so a recycled id never serves stale arrays)."""
    import weakref

    from audiobd_tpu.train.scan_epoch import DeviceDataset

    entry = _device_cache.get(id(data))
    if entry is not None and entry[0]() is data:
        return entry[1]
    dset = DeviceDataset(data)
    key = id(data)
    _device_cache[key] = (weakref.ref(data, lambda _: _device_cache.pop(key, None)), dset)
    return dset


def make_tester(model, batch_size: int = 256):
    """(params, batch_stats, ArraySet) → (loss, acc-fraction) — the
    reference's temp_test contract (fp.py:36-50)."""
    from audiobd_tpu.train.scan_epoch import make_eval_epoch_fn, run_eval_scan
    from audiobd_tpu.train.state import TrainState

    eval_fn = make_eval_epoch_fn(model)

    def tester(params, batch_stats, data: ArraySet):
        state = TrainState(params=params, batch_stats=batch_stats, opt_state=None, step=0)
        out = run_eval_scan(eval_fn, state, device_dataset(data), min(batch_size, len(data)))
        return out["loss"], out["acc"] / 100.0

    return tester


def make_full_tester(model, batch_size: int = 256):
    """(params, batch_stats, clean_test, bd_test_complete) →
    (clean_acc, asr, clean_loss, bd_loss) — the reference's test()."""
    from audiobd_tpu.train.scan_epoch import make_eval_epoch_fn, run_eval_scan
    from audiobd_tpu.train.state import TrainState

    eval_fn = make_eval_epoch_fn(model)

    def tester(params, batch_stats, clean_test: ArraySet, bd_complete: ArraySet):
        state = TrainState(params=params, batch_stats=batch_stats, opt_state=None, step=0)
        clean = run_eval_scan(eval_fn, state, device_dataset(clean_test), min(batch_size, len(clean_test)))
        bd = run_eval_scan(eval_fn, state, device_dataset(bd_complete), min(batch_size, len(bd_complete)))
        return clean["acc"], bd["asr"], clean["loss"], bd["loss"]

    return tester


@functools.lru_cache(maxsize=16)
def _cached_train_epoch_fn(model, tx):
    """One jitted scan-epoch program per (model, tx) pair.

    Defense loops call finetune_epochs repeatedly (e.g. TSBD's 11 reinit
    ratios); without memoization each call re-jits the epoch and pays a
    fresh tunnel compile. flax Modules hash by structure, so architecturally
    identical models share the entry; pass the SAME tx instance across calls
    to share it (optax transforms hash by closure identity).
    """
    from audiobd_tpu.train.scan_epoch import make_train_epoch_fn

    return make_train_epoch_fn(model, tx, donate=False)


def finetune_epochs(
    model,
    params,
    batch_stats,
    data: ArraySet,
    tx: optax.GradientTransformation,
    epochs: int,
    batch_size: int,
    seed: int,
    project: Callable[[Any], Any] | None = None,
    on_epoch: Callable[[int, Any, Any], None] | None = None,
):
    """Plain supervised fine-tuning for N epochs; ``project`` (e.g. a prune
    mask re-application) runs after every epoch, then ``on_epoch(epoch,
    params, batch_stats)`` — one optimizer instance and one shuffle stream
    across all epochs, matching the reference's single-Adam fine-tunes.

    Each epoch is a single device-resident lax.scan (train/scan_epoch.py);
    host work between epochs is only the ``project``/``on_epoch`` hooks.
    """
    from audiobd_tpu.train.scan_epoch import run_train_epoch_scan
    from audiobd_tpu.train.state import TrainState, jitted_opt_init

    state = TrainState(params=params, batch_stats=batch_stats, opt_state=jitted_opt_init(tx, params), step=jnp.zeros((), jnp.int32))
    # donate=False: the defense loops reuse params_o/batch_stats pytrees
    # across calls (e.g. per-ratio restarts), so inputs must stay live.
    epoch_fn = _cached_train_epoch_fn(model, tx)
    dset = device_dataset(data)
    np_rng = rnd.np_rng(seed, "defense_ft")
    key = rnd.named_key(seed, "defense_ft_dropout")
    metrics = None
    bs = min(batch_size, len(data))
    for epoch in range(epochs):
        state, metrics = run_train_epoch_scan(epoch_fn, state, dset, bs, key, np_rng)
        if project is not None:
            state = state.replace(params=project(state.params))
        if on_epoch is not None:
            on_epoch(epoch, state.params, state.batch_stats)
    return state.params, state.batch_stats, metrics
