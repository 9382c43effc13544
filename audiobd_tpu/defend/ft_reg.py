"""FT-reg defense: sharpness-aware fine-tuning + neuron scoring/pruning
(reference ft_reg.py:44-344).

1. ``reg_epochs`` epochs of the two-pass update on the 5% clean-val split:
   g1 = ∇L(θ); θ' = θ + r·g1/‖g1‖ (per-tensor norms); g2 = ∇L(θ');
   apply (1−α)·g1 + α·g2 with SGD-momentum — one jitted step.
2. Neuron scores over conv layers:
   * per-neuron weight norms (from the ORIGINAL attacked params — the
     reference passes params_o, ft_reg.py:285);
   * loss-change-on-prune for clean-test / bd-test / val loaders;
   * grad-change = ‖g_T − g_0‖ of the whole layer assigned to every neuron
     in it (quirk preserved — ft_reg.py:300-303, SURVEY.md §6b.5);
   * score = invert(norm(0.9·z(grad_change) + 0.1·z(vlc))), zeroed where
     vlc > 0.
3. Zero the top-scored neurons at ratios [0.01…0.9] and report acc/ASR.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audiobd_tpu.configs import AttackConfig
from audiobd_tpu.defend.common import (
    DefenseData,
    get_leaf,
    layer_kernels,
    load_bd_model,
    load_defense_data,
    make_full_tester,
    make_tester,
    neuron_weight_norms,
    set_leaf,
    zero_neurons,
)
from audiobd_tpu.train.loop import iter_batches, make_batch
from audiobd_tpu.utils import random as rnd
from audiobd_tpu.utils.logging import append_csv_row, prepend_csv_header

PRUNE_RATIOS = [0.01, 0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.4, 0.5, 0.7, 0.9]


def make_reg_step(model, tx, r: float, alpha: float):
    def step(params, opt_state, batch_stats, batch):
        def loss_fn(p):
            logits = model.apply({"params": p, "batch_stats": batch_stats}, batch["x"], train=False)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, batch["y"])
            mask = batch["mask"].astype(jnp.float32)
            return jnp.sum(ce * mask) / jnp.maximum(mask.sum(), 1.0)

        g1 = jax.grad(loss_fn)(params)
        perturbed = jax.tree_util.tree_map(
            lambda p, g: p + r * g / jnp.maximum(jnp.linalg.norm(g), 1e-12), params, g1
        )
        g2 = jax.grad(loss_fn)(perturbed)
        final = jax.tree_util.tree_map(lambda a, b: (1 - alpha) * a + alpha * b, g1, g2)
        updates, opt_state = tx.update(final, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, final

    return jax.jit(step)


def make_reg_epochs_fn(model, tx, r: float, alpha: float):
    """Device-resident multi-epoch SAM loop: one lax.scan over every batch of
    every epoch in the call (perm shaped (steps, bs)). Returns the applied
    gradient of the final batch — the probe the reference's grad-change score
    reads (ft_reg.py:297-303). Same math, same batch composition, and same
    update order as make_reg_step; only the dispatch granularity changes."""

    def run(params, opt_state, batch_stats, feats, labels, perms, masks):
        def loss_at(p, idx, bmask):
            logits = model.apply({"params": p, "batch_stats": batch_stats}, feats[idx], train=False)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels[idx])
            fm = bmask.astype(jnp.float32)
            return jnp.sum(ce * fm) / jnp.maximum(fm.sum(), 1.0)

        def body(carry, inputs):
            params, opt_state, _ = carry
            idx, bmask = inputs
            g1 = jax.grad(loss_at)(params, idx, bmask)
            perturbed = jax.tree_util.tree_map(
                lambda p, g: p + r * g / jnp.maximum(jnp.linalg.norm(g), 1e-12), params, g1
            )
            g2 = jax.grad(loss_at)(perturbed, idx, bmask)
            final = jax.tree_util.tree_map(lambda a, b: (1 - alpha) * a + alpha * b, g1, g2)
            updates, opt_state = tx.update(final, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, final), None

        zero_grad = jax.tree_util.tree_map(jnp.zeros_like, params)
        (params, opt_state, last_grad), _ = jax.lax.scan(
            body, (params, opt_state, zero_grad), (perms, masks)
        )
        return params, opt_state, last_grad

    return jax.jit(run)


def run_reg_epochs(epoch_fn, params, opt_state, batch_stats, dset, batch_size, epochs, np_rng):
    """Drive make_reg_epochs_fn for ``epochs`` epochs in one dispatch."""
    from audiobd_tpu.train.scan_epoch import make_perm, pad_plan

    n_batches, mask = pad_plan(dset.n, batch_size)
    perms = np.concatenate(
        [make_perm(np_rng, dset.n, n_batches, batch_size) for _ in range(epochs)]
    )
    masks = np.concatenate([mask] * epochs)
    return epoch_fn(
        params, opt_state, batch_stats, dset.feats, dset.labels,
        jnp.asarray(perms), jnp.asarray(masks),
    )


def normalize_and_invert(scores: np.ndarray) -> np.ndarray:
    lo, hi = scores.min(), scores.max()
    return 1.0 - (scores - lo) / max(hi - lo, 1e-12)


def loss_changes(model, params, batch_stats, data, neurons, base_loss, batch_size):
    """Loss delta from zeroing each conv neuron (reference get_loss_change,
    ft_reg.py:179-190), one jitted masked-eval per layer."""
    x_list, y_list, m_list = [], [], []
    for idx, mask in iter_batches(len(data), min(batch_size, len(data)), shuffle=False):
        b = make_batch(data.feats, data.labels, data.indicators, idx, mask)
        x_list.append(b["x"])
        y_list.append(b["y"])
        m_list.append(b["mask"])
    xs = jnp.asarray(np.stack(x_list))
    ys = jnp.asarray(np.stack(y_list))
    ms = jnp.asarray(np.stack(m_list))

    @jax.jit
    def eval_loss(p):
        def one(x, y, m):
            logits = model.apply({"params": p, "batch_stats": batch_stats}, x, train=False)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            fm = m.astype(jnp.float32)
            return jnp.sum(ce * fm) / jnp.maximum(fm.sum(), 1.0)

        return jnp.mean(jax.vmap(one)(xs, ys, ms))

    # vmap the ablation per layer: only the modified kernel is materialized
    # per lane; the rest of the params broadcast. One compiled program per
    # layer instead of one full-loader eval per neuron.
    by_layer: dict[str, list[int]] = {}
    for layer, idx in neurons:
        by_layer.setdefault(layer, []).append(idx)

    losses: dict[tuple[str, int], float] = {}
    lane_chunk = 16  # bound activation memory: ≤16 ablated models at once
    for layer, idxs in by_layer.items():
        kernel = jnp.asarray(get_leaf(params, layer))

        def loss_for_idx(idx, layer=layer, kernel=kernel):
            return eval_loss(set_leaf(params, layer, kernel.at[..., idx].set(0.0)))

        vmapped = jax.jit(jax.vmap(loss_for_idx))
        for start in range(0, len(idxs), lane_chunk):
            chunk = idxs[start : start + lane_chunk]
            padded = chunk + [chunk[-1]] * (lane_chunk - len(chunk))
            vals = np.asarray(vmapped(jnp.asarray(padded)))
            for idx, val in zip(chunk, vals):
                losses[(layer, idx)] = float(val)
    return [losses[(layer, idx)] - base_loss for layer, idx in neurons]


@dataclass
class FTRegResult:
    per_ratio: list = field(default_factory=list)
    scores: np.ndarray | None = None


def mitigation(
    cfg: AttackConfig,
    val_ratio: float = 0.05,
    lr_ft: float = 0.001,
    reg_epochs: int = 300,
    r: float = 0.05,
    alpha: float = 0.7,
    prune_ratios: list | None = None,
    data: DefenseData | None = None,
    verbose: bool = True,
) -> FTRegResult:
    save_dir = os.path.join(cfg.record_dir, "defense", "ft_reg")
    os.makedirs(save_dir, exist_ok=True)
    data = data or load_defense_data(cfg, val_ratio)
    model, variables, spec = load_bd_model(cfg)
    params_o, batch_stats = variables["params"], variables["batch_stats"]
    bs = cfg.train.batch_size
    tester = make_tester(model, bs)
    full_tester = make_full_tester(model, bs)

    # 1. sharpness-aware fine-tuning — device-resident scan over epoch chunks
    # (one compiled dispatch per chunk instead of one per batch; the per-batch
    # path cost 300 epochs of host round-trips over the tunnel).
    from audiobd_tpu.defend.common import device_dataset

    tx = optax.sgd(lr_ft, momentum=0.9)
    epoch_fn = make_reg_epochs_fn(model, tx, r, alpha)
    dset = device_dataset(data.clean_val)
    val_bs = min(bs, len(data.clean_val))
    params = params_o
    from audiobd_tpu.train.state import jitted_opt_init

    opt_state = jitted_opt_init(tx, params)
    np_rng = rnd.np_rng(cfg.train.seed, "ftreg_shuffle")

    # epoch 0 alone, to capture the reference's grad_s probe (the gradient
    # applied at the end of the first epoch, ft_reg.py:297).
    first = min(1, reg_epochs)
    grad_s = grad_t = None
    if first:
        params, opt_state, last_grad = run_reg_epochs(
            epoch_fn, params, opt_state, batch_stats, dset, val_bs, 1, np_rng
        )
        grad_s = jax.tree_util.tree_map(np.asarray, last_grad)
        grad_t = grad_s
    done = first
    chunk = 10  # fixed chunk size → at most three jit shapes (1, chunk, tail)
    while done < reg_epochs:
        n = min(chunk, reg_epochs - done)
        params, opt_state, last_grad = run_reg_epochs(
            epoch_fn, params, opt_state, batch_stats, dset, val_bs, n, np_rng
        )
        grad_t = last_grad
        done += n
        if verbose:
            acc, asr, _, _ = full_tester(params, batch_stats, data.clean_test, data.bd_test_complete)
            print(f"ft_reg epoch {done}: acc {acc:.2f} asr {asr:.2f}")
    grad_t = jax.tree_util.tree_map(np.asarray, grad_t)

    # 2. neuron scoring
    weight_norms, neurons = neuron_weight_norms(params_o, "conv")
    clean_loss, _ = tester(params, batch_stats, data.clean_test)
    bd_loss, _ = tester(params, batch_stats, data.bd_test)
    val_loss, _ = tester(params, batch_stats, data.clean_val)
    clc = loss_changes(model, params, batch_stats, data.clean_test, neurons, clean_loss, bs)
    blc = loss_changes(model, params, batch_stats, data.bd_test, neurons, bd_loss, bs)
    vlc = np.asarray(loss_changes(model, params, batch_stats, data.clean_val, neurons, val_loss, bs))

    grad_change = []
    for layer, _idx in neurons:
        diff = np.asarray(get_leaf(grad_t, layer)) - np.asarray(get_leaf(grad_s, layer))
        grad_change.append(float(np.linalg.norm(diff)))  # whole-layer norm per neuron (quirk)
    grad_change = np.asarray(grad_change)

    def zscore(v):
        return (v - v.mean()) / max(v.std(), 1e-12)

    w = 0.9
    scores = normalize_and_invert(w * zscore(grad_change) + (1 - w) * zscore(vlc))
    scores[vlc > 0] = 0.0

    # 3. prune at ratios
    order = np.argsort(scores)[::-1]
    csv_path = os.path.join(save_dir, "pruning_data.csv")
    if os.path.exists(csv_path):
        os.remove(csv_path)
    per_ratio = []
    for ratio in prune_ratios or PRUNE_RATIOS:
        top = [neurons[i] for i in order[: int(ratio * len(neurons))]]
        pruned = zero_neurons(params, top)
        acc, asr, closs, bloss = full_tester(pruned, batch_stats, data.clean_test, data.bd_test_complete)
        per_ratio.append((ratio, acc, asr))
        append_csv_row(csv_path, [ratio, closs, bloss, acc, asr])
        if verbose:
            print(f"ft_reg prune {ratio}: acc {acc:.2f} asr {asr:.2f}")
    prepend_csv_header(csv_path, ["ratio", "clean_test_loss", "bd_test_loss", "test_clean_acc", "test_asr"])
    return FTRegResult(per_ratio=per_ratio, scores=scores)
