"""Fine-Pruning defense (reference fp.py:36-210).

1. Profile the input activations of the final classifier layer on the
   first validation batch (the reference's accumulation flag makes only the
   first batch contribute, fp.py:139-147 — quirk preserved via
   ``first_batch_only=True``).
2. Iteratively zero the lowest-activation input channels of the final
   linear layer, ``once_prune_ratio`` of them per step, testing clean acc +
   ASR each step; stop once the relative clean-acc drop exceeds
   ``acc_ratio``; log pruning_data.csv.
3. Fine-tune one epoch on the 5% clean-val split (Adam ``lr_ft``) with the
   prune mask re-applied, then full test; log ft_data.csv.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audiobd_tpu.configs import AttackConfig
from audiobd_tpu.defend.common import (
    DefenseData,
    finetune_epochs,
    get_leaf,
    load_bd_model,
    load_defense_data,
    make_full_tester,
    set_leaf,
)
from audiobd_tpu.train.loop import iter_batches, make_batch
from audiobd_tpu.utils.logging import append_csv_row, prepend_csv_header

FINAL_LAYER = {
    "smallcnn": "fc2/Dense_0/kernel",
    "largecnn": "fc3/Dense_0/kernel",
    "smalllstm": "fc2/Dense_0/kernel",
    "lstmwithattention": "output/Dense_0/kernel",
    "rnn": "fc/Dense_0/kernel",
    "resnet": "fc/Dense_0/kernel",
}


def final_layer_name(model_name: str, params: dict) -> str:
    name = FINAL_LAYER[model_name.lower()]
    get_leaf(params, name)  # raises if the path drifted
    return name


def profile_activations(model, variables, data, batch_size: int, first_batch_only: bool = True) -> np.ndarray:
    """Mean input activation of the final classifier over the val set."""
    total = np.zeros([], np.float64)
    acc = None
    n = len(data)
    for idx, mask in iter_batches(n, min(batch_size, n), shuffle=False):
        batch = make_batch(data.feats, data.labels, data.indicators, idx, mask)
        _, mut = model.apply(
            variables, jnp.asarray(batch["x"]), train=False, mutable=["intermediates"]
        )
        feats = np.asarray(mut["intermediates"]["features"][0])
        feats = feats[np.asarray(batch["mask"])]
        contrib = feats.sum(axis=0) / n
        acc = contrib if acc is None else acc + contrib
        if first_batch_only:
            break
    return acc


@dataclass
class FPResult:
    pruned_channels: int
    test_acc: float
    test_asr: float
    history: list


def _sweep_prune_levels(model, params, batch_stats, layer, seq_sort, levels,
                        clean_test, bd_test, batch_size):
    """Clean-acc + ASR at EVERY candidate pruning level, one compiled program.

    The reference's loop (fp.py:164-195) rebuilds a pruned weight per step and
    runs two full evals — per-step dispatches whose index shapes change every
    iteration (a fresh compile each on a remote backend). Here pruning level
    ``L`` is a traced scalar: channel c is zeroed iff rank[c] < L-1 (rank =
    ascending-activation position, reproducing seq_sort[:L-1]), so ONE vmapped
    program evaluates the whole sweep on device.

    Returns (acc, asr) fractions, one entry per level.
    """
    from audiobd_tpu.defend.common import device_dataset
    from audiobd_tpu.train.scan_epoch import eval_epoch_fn, make_perm, pad_plan

    kernel0 = jnp.asarray(get_leaf(params, layer))
    n_channels = kernel0.shape[0]
    rank = np.empty(n_channels, np.int32)
    rank[np.asarray(seq_sort)] = np.arange(n_channels, dtype=np.int32)
    epoch = eval_epoch_fn(model)

    clean_dev = device_dataset(clean_test)
    bd_dev = device_dataset(bd_test)

    def eval_plan(dset):
        bs = min(batch_size, dset.n)
        nb, mask = pad_plan(dset.n, bs)
        return jnp.asarray(make_perm(None, dset.n, nb, bs)), jnp.asarray(mask)

    clean_perm, clean_mask = eval_plan(clean_dev)
    bd_perm, bd_mask = eval_plan(bd_dev)

    @jax.jit
    def sweep(params, batch_stats, kernel0, rank, levels_arr, clean_arrs, bd_arrs):
        def one(level):
            kern = jnp.where(rank[:, None] < level - 1, 0.0, kernel0)
            p = set_leaf(params, layer, kern)
            _, c = epoch(p, batch_stats, *clean_arrs, clean_perm, clean_mask)
            _, b = epoch(p, batch_stats, *bd_arrs, bd_perm, bd_mask)
            return c, b

        return jax.vmap(one)(levels_arr)

    c_sums, b_sums = jax.device_get(
        sweep(params, batch_stats, kernel0, jnp.asarray(rank),
              jnp.asarray(levels, jnp.int32),
              (clean_dev.feats, clean_dev.labels, clean_dev.indicators),
              (bd_dev.feats, bd_dev.labels, bd_dev.indicators))
    )
    acc = c_sums[:, 0] / np.maximum(c_sums[:, 1], 1)
    asr = b_sums[:, 0] / np.maximum(b_sums[:, 1], 1)
    return acc, asr


def mitigation(
    cfg: AttackConfig,
    val_ratio: float = 0.05,
    acc_ratio: float = 0.1,
    once_prune_ratio: float = 0.01,
    lr_ft: float = 0.01,
    first_batch_only: bool = True,
    data: DefenseData | None = None,
    verbose: bool = True,
) -> FPResult:
    save_dir = os.path.join(cfg.record_dir, "defense", "fp")
    os.makedirs(save_dir, exist_ok=True)
    data = data or load_defense_data(cfg, val_ratio)
    model, variables, spec = load_bd_model(cfg)
    params, batch_stats = variables["params"], variables["batch_stats"]
    bs = cfg.train.batch_size

    activation = profile_activations(model, variables, data.clean_val, bs, first_batch_only)
    seq_sort = np.argsort(activation)  # ascending: least-active first

    layer = final_layer_name(spec["model"], params)
    kernel0 = jnp.asarray(get_leaf(params, layer))  # (in, out)
    n_channels = kernel0.shape[0]
    assert n_channels == len(seq_sort)

    full_tester = make_full_tester(model, bs)
    csv_path = os.path.join(save_dir, "pruning_data.csv")
    if os.path.exists(csv_path):
        os.remove(csv_path)

    step_size = math.ceil(n_channels * once_prune_ratio)
    levels = list(range(0, n_channels, step_size))
    sweep_acc, sweep_asr = _sweep_prune_levels(
        model, params, batch_stats, layer, seq_sort, levels,
        data.clean_test, data.bd_test, bs,
    )
    # The break rule walks the precomputed sweep exactly as the reference's
    # loop does (fp.py:164-195): rows are logged up to and including the
    # first level whose relative clean-acc drop exceeds acc_ratio.
    test_acc_ori = None
    last_index = 0
    history = []
    for i, num_pruned in enumerate(levels):
        test_acc, test_asr = float(sweep_acc[i]), float(sweep_asr[i])
        history.append((num_pruned, num_pruned / n_channels, test_acc, test_asr))
        append_csv_row(csv_path, [num_pruned, num_pruned / n_channels, test_acc, test_asr])
        if verbose:
            print(f"Pruned {num_pruned}/{n_channels}: acc {100*test_acc:.2f}, asr {100*test_asr:.2f}")
        if num_pruned == 0:
            test_acc_ori = test_acc
        elif abs(test_acc - test_acc_ori) / max(test_acc_ori, 1e-9) < acc_ratio:
            last_index = num_pruned
        else:
            break
    prepend_csv_header(csv_path, ["num_pruned", "pruning_ratio", "test_acc", "test_asr"])
    # Row mask instead of index scatter: the pruned-row count varies per run,
    # and an eager gather/scatter with a unique index shape costs a fresh
    # ~30-70 s compile over a remote-attached chip. A fixed-shape boolean
    # mask multiply is one cacheable program for every last_index.
    keep = np.ones((n_channels, 1), np.float32)
    if last_index:
        keep[seq_sort[: last_index - 1]] = 0.0
        last_params = set_leaf(params, layer, np.array(get_leaf(params, layer)) * keep)
    else:
        last_params = params
    keep_dev = jnp.asarray(keep)

    def project(p):
        if not last_index:
            return p
        return set_leaf(p, layer, get_leaf(p, layer) * keep_dev)

    ft_params, ft_stats, _ = finetune_epochs(
        model, last_params, batch_stats, data.clean_val,
        optax.adam(lr_ft), epochs=1, batch_size=bs, seed=cfg.train.seed, project=project,
    )
    clean_acc, asr, clean_loss, bd_loss = full_tester(
        ft_params, ft_stats, data.clean_test, data.bd_test_complete
    )
    if verbose:
        print(f"End Ftune. test_clean_acc:{clean_acc:.2f}  test_asr:{asr:.2f}")
    ft_csv = os.path.join(save_dir, "ft_data.csv")
    append_csv_row(ft_csv, ["test_clean_acc", "test_asr", "clean_test_loss", "bd_test_loss"])
    append_csv_row(ft_csv, [clean_acc, asr, clean_loss, bd_loss])
    return FPResult(last_index, clean_acc, asr, history)
