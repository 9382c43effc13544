"""TSBD defense: unlearn → neuron-weight-change reinit → fine-tune
(reference tsbd.py:43-404).

Stages:
  A. ``only_finetune`` (the reference's default branch, tsbd.py:268-290):
     one epoch of SGD-momentum fine-tuning on the 5% clean-val split,
     test + finetuning_data.csv, return.
  B. Unlearning: gradient *ascent* (maximize CE) with Adam ``lr_un`` until
     the monitored metric floors (val acc ≤ 0.10 / test acc ≤ 0.10 /
     ASR ≤ 0.05 by ``data_type``), recording per-neuron grad norms of
     ``record_layer``. The reference's loop body returns after the first
     batch (tsbd.py:133-138 — quirk preserved via ``first_batch_only``).
  C. NWC: per-neuron summed |Δw| vs the original model → ucn.txt,
     n2w_dict, unlearned model.
  D. zero_reinit_weight per ratio: zero the globally top-``wratio``
     largest-changed weights within the top-changed neurons of the
     *original* model, then fine-tune with periodic tests; CSVs.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audiobd_tpu.configs import AttackConfig
from audiobd_tpu.defend.common import (
    DefenseData,
    finetune_epochs,
    get_leaf,
    layer_kernels,
    load_bd_model,
    load_defense_data,
    make_full_tester,
    make_tester,
    neuron_weight_changes,
    set_leaf,
)
from audiobd_tpu.train.loop import iter_batches, make_batch
from audiobd_tpu.train.state import jitted_opt_init
from audiobd_tpu.utils import random as rnd
from audiobd_tpu.utils.logging import append_csv_row, prepend_csv_header, write_csv

REINIT_RATIOS = [0.01, 0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.4, 0.5, 0.7, 0.9]


def default_record_layer(params: dict) -> str:
    """Last conv kernel — the reference's default 'conv3.weight' analogue."""
    return layer_kernels(params, "conv")[-1][0]


def make_unlearn_step(model, tx):
    """One gradient-ascent step; also returns per-neuron |grad| sums of the
    record layer and the batch train accuracy (reference train_unlearning,
    tsbd.py:108-138, which logs the unlearning train accuracy per epoch)."""

    def step(params, opt_state, batch_stats, batch, record_layer: str):
        def neg_loss(p):
            logits = model.apply({"params": p, "batch_stats": batch_stats}, batch["x"], train=False)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, batch["y"])
            mask = batch["mask"].astype(jnp.float32)
            return -jnp.sum(ce * mask) / jnp.maximum(mask.sum(), 1.0), logits

        (loss_neg, logits), grads = jax.value_and_grad(neg_loss, has_aux=True)(params)
        mask = batch["mask"].astype(jnp.float32)
        hits = (jnp.argmax(logits, axis=-1) == batch["y"]).astype(jnp.float32)
        train_acc = jnp.sum(hits * mask) / jnp.maximum(mask.sum(), 1.0)
        g = jnp.asarray(get_leaf(grads, record_layer))
        grad_norm = jnp.sum(jnp.abs(g.reshape(-1, g.shape[-1])), axis=0)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, -loss_neg, train_acc, grad_norm

    return jax.jit(step, static_argnames=("record_layer",))


def make_unlearn_loop(model, tx, record_layer: str, data_type: str, max_epochs: int):
    """Stage-B unlearning as ONE jitted lax.while_loop on device.

    The host loop pays 4 remote dispatches per epoch (ascent step + 3 full
    evals) for up to ``max_epochs`` epochs — minutes of tunnel latency for
    seconds of compute. Here the whole until-floor loop is a single compiled
    program: per iteration it draws the epoch's first shuffled batch
    (first-batch quirk, reference tsbd.py:133-138), takes the ascent step,
    runs the three evals, records the metric/grad-norm row into a
    preallocated (max_epochs, 6+n_neurons) buffer, and stops when the
    ``data_type`` floor is hit (reference tsbd.py:310-341).

    Returns a jitted fn(params, opt_state, batch_stats, loader_arrs,
    loader_bs, evals, key) → (params, opt_state, n_epochs, rows), where
    ``evals`` is a dict of (feats, labels, indicators, perm, mask) per eval
    set and ``loader_bs`` is static via closure.
    """
    from audiobd_tpu.train.scan_epoch import eval_epoch_fn

    eval_epoch = eval_epoch_fn(model)

    def eval_acc(params, batch_stats, arrs):
        feats, labels, indicators, perm, mask = arrs
        _, sums = eval_epoch(params, batch_stats, feats, labels, indicators, perm, mask)
        return sums[0].astype(jnp.float32) / jnp.maximum(sums[1], 1).astype(jnp.float32)

    def loop(params, opt_state, batch_stats, loader_arrs, bs, evals, key):
        feats, labels = loader_arrs
        n = feats.shape[0]
        n_neurons = get_leaf(params, record_layer).shape[-1]
        rows0 = jnp.zeros((max_epochs, 6 + n_neurons), jnp.float32)

        def cond(carry):
            params, opt_state, epoch, done, rows = carry
            return (epoch < max_epochs) & ~done

        def body(carry):
            params, opt_state, epoch, done, rows = carry
            perm = jax.random.permutation(jax.random.fold_in(key, epoch), n)
            idx = jax.lax.dynamic_slice_in_dim(perm, 0, bs)
            bx, by = feats[idx], labels[idx]

            def neg_loss(p):
                logits = model.apply({"params": p, "batch_stats": batch_stats}, bx, train=False)
                ce = optax.softmax_cross_entropy_with_integer_labels(logits, by)
                return -jnp.mean(ce), logits

            (loss_neg, logits), grads = jax.value_and_grad(neg_loss, has_aux=True)(params)
            train_acc = jnp.mean((jnp.argmax(logits, axis=-1) == by).astype(jnp.float32))
            g = jnp.asarray(get_leaf(grads, record_layer))
            grad_norm = jnp.sum(jnp.abs(g.reshape(-1, g.shape[-1])), axis=0)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

            val_acc = eval_acc(params, batch_stats, evals["clean_val"])
            test_acc = eval_acc(params, batch_stats, evals["clean_test"])
            test_asr = eval_acc(params, batch_stats, evals["poison_test"])
            head = jnp.stack([epoch.astype(jnp.float32), -loss_neg, train_acc,
                              test_acc, test_asr, val_acc])
            rows = jax.lax.dynamic_update_slice(
                rows, jnp.concatenate([head, grad_norm])[None, :], (epoch, 0)
            )
            floored = {
                "clean_val": val_acc <= 0.10,
                "clean_test": test_acc <= 0.10,
                "poison_test": test_asr <= 0.05,
            }[data_type]
            return params, opt_state, epoch + 1, floored, rows

        params, opt_state, n_epochs, _, rows = jax.lax.while_loop(
            cond, body, (params, opt_state, jnp.zeros((), jnp.int32), jnp.zeros((), bool), rows0)
        )
        return params, opt_state, n_epochs, rows

    return jax.jit(loop, static_argnames=("bs",))


def _eval_plan(data, bs: int = 256):
    """Device-resident eval batching plan. ``bs`` must be the config's train
    batch size: eval loss rows are means of per-batch means, so the batching
    must match the host testers' (make_tester/full_tester use
    cfg.train.batch_size) for the CSV loss columns to agree across paths."""
    from audiobd_tpu.defend.common import device_dataset
    from audiobd_tpu.train.scan_epoch import make_perm, pad_plan

    dset = device_dataset(data)
    bs = min(bs, dset.n)
    nb, mask = pad_plan(dset.n, bs)
    perm = jnp.asarray(make_perm(None, dset.n, nb, bs))
    return (dset.feats, dset.labels, dset.indicators, perm, jnp.asarray(mask))


def _host_unlearn(model, tx, unlearn_epochs, loader, data, data_type, bs, cfg,
                  record_layer, params, opt_state, batch_stats, tester,
                  grad_rows_avg, grad_rows_var, verbose):
    """Per-batch multi-batch host unlearning loop. Only serves
    first_batch_only=False — the single-batch quirk path runs entirely on
    device (make_unlearn_loop); per-epoch multi-batch grad statistics need
    host accumulation."""
    unlearn_step = make_unlearn_step(model, tx)
    np_rng = rnd.np_rng(cfg.train.seed, "tsbd_unlearn")
    for epoch in range(unlearn_epochs):
        grad_norms = []
        losses = []
        train_accs = []
        for idx, mask in iter_batches(len(loader), min(bs, len(loader)), np_rng, shuffle=True):
            batch = make_batch(loader.feats, loader.labels, loader.indicators, idx, mask)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            params, opt_state, loss, train_acc, gn = unlearn_step(
                params, opt_state, batch_stats, batch, record_layer
            )
            grad_norms.append(np.asarray(gn))
            losses.append(float(loss))
            train_accs.append(float(train_acc))
        gn_arr = np.stack(grad_norms)
        _, val_acc = tester(params, batch_stats, data.clean_val)
        _, test_acc = tester(params, batch_stats, data.clean_test)
        _, test_asr = tester(params, batch_stats, data.bd_test)
        row_head = [epoch, float(np.mean(losses)), float(np.mean(train_accs)), test_acc, test_asr, val_acc]
        grad_rows_avg.append(row_head + gn_arr.mean(axis=0).tolist())
        grad_rows_var.append(row_head + gn_arr.var(axis=0).tolist())
        if verbose:
            print(f"unlearn {epoch}: acc {100*test_acc:.2f} asr {100*test_asr:.2f} val {100*val_acc:.2f}")
        if (
            (data_type == "clean_val" and val_acc <= 0.10)
            or (data_type == "clean_test" and test_acc <= 0.10)
            or (data_type == "poison_test" and test_asr <= 0.05)
        ):
            break
    return params, opt_state


def make_stage_d_fn(model, tx_ft):
    """Stage D (reference tsbd.py:371-404) as ONE jitted program.

    The host loop runs 11 ratios × 52 fine-tune epochs as separate
    dispatches (plus evals every 10 epochs) — ~700 round trips to a
    remote-attached chip, which made the cache-warm TSBD full path 14 min
    (measured; the compute itself is seconds). Here the per-ratio reinit
    params are STACKED and vmapped, each ratio runs the same single-Adam
    scan over precomputed per-epoch permutations (the exact host shuffle
    stream), and the clean/bd evals run inside the scan every epoch — the
    %10 CSV cadence selects rows on the host afterwards.

    Returns jitted fn(params_stack, batch_stats, val_arrs, perms, masks,
    key, clean_arrs, bd_arrs) → (pre_rows (R, 10), rows (R, E, 10)) where a
    row is [closs, bloss, c_hit, c_n, c_phit, c_pn, b_hit, b_n, b_phit,
    b_pn] (losses are per-batch means; counts are the eval metric sums).
    """
    from audiobd_tpu.train.scan_epoch import eval_epoch_fn, train_epoch_fn
    from audiobd_tpu.train.state import TrainState

    train_epoch = train_epoch_fn(model, tx_ft)
    eval_epoch = eval_epoch_fn(model)

    def eval_row(params, stats, clean_arrs, bd_arrs):
        closs, csums = eval_epoch(params, stats, *clean_arrs)
        bloss, bsums = eval_epoch(params, stats, *bd_arrs)
        return jnp.concatenate([
            jnp.stack([closs.mean(), bloss.mean()]),
            csums.astype(jnp.float32), bsums.astype(jnp.float32),
        ])

    def one_ratio(params0, batch_stats, val_arrs, perms, masks, key, clean_arrs, bd_arrs):
        feats, labels, indicators = val_arrs
        state0 = TrainState(
            params=params0, batch_stats=batch_stats,
            opt_state=tx_ft.init(params0), step=jnp.zeros((), jnp.int32),
        )
        pre = eval_row(params0, batch_stats, clean_arrs, bd_arrs)

        def body(state, inputs):
            perm, mask = inputs
            state, _, _ = train_epoch(state, feats, labels, indicators, perm, mask, key)
            return state, eval_row(state.params, state.batch_stats, clean_arrs, bd_arrs)

        _, rows = jax.lax.scan(body, state0, (perms, masks))
        return pre, rows

    return jax.jit(jax.vmap(one_ratio, in_axes=(0,) + (None,) * 7))


@dataclass
class TSBDResult:
    stage: str
    test_acc: float = 0.0
    test_asr: float = 0.0
    per_ratio: list = field(default_factory=list)


def mitigation(
    cfg: AttackConfig,
    only_finetune: bool = True,
    data_type: str = "clean_val",
    val_ratio: float = 0.05,
    lr_un: float = 1e-4,
    unlearn_epochs: int = 1000,
    reinit_weight_ratio: float = 0.7,
    lr_ft: float = 0.01,
    ft_epochs: int = 51,
    record_layer: str | None = None,
    first_batch_only: bool = True,
    reinit_ratios: list | None = None,
    data: DefenseData | None = None,
    vectorized_ft: bool = True,
    verbose: bool = True,
) -> TSBDResult:
    import time as _time

    _t0 = _time.perf_counter()

    def _stage(msg):
        if verbose:
            print(f"[tsbd +{_time.perf_counter() - _t0:.1f}s] {msg}", flush=True)

    save_dir = os.path.join(cfg.record_dir, "defense", "tsbd")
    os.makedirs(save_dir, exist_ok=True)
    data = data or load_defense_data(cfg, val_ratio)
    model, variables, spec = load_bd_model(cfg)
    _stage("data + model loaded")
    params_o, batch_stats = variables["params"], variables["batch_stats"]
    bs = cfg.train.batch_size
    tester = make_tester(model, bs)
    full_tester = make_full_tester(model, bs)

    # ---------------- stage A: plain fine-tune (default branch)
    if only_finetune:
        ft_csv = os.path.join(save_dir, "finetuning_data.csv")
        if os.path.exists(ft_csv):
            os.remove(ft_csv)
        ft_params, ft_stats, _ = finetune_epochs(
            model, params_o, batch_stats, data.clean_val,
            optax.sgd(lr_ft, momentum=0.9), epochs=1, batch_size=bs, seed=cfg.train.seed,
        )
        acc, asr, closs, bloss = full_tester(ft_params, ft_stats, data.clean_test, data.bd_test_complete)
        append_csv_row(ft_csv, [0, closs, bloss, acc, asr])
        prepend_csv_header(ft_csv, ["epoch", "clean_test_loss", "bd_test_loss", "test_clean_acc", "test_asr"])
        if verbose:
            print(f"finetune-only: acc {acc:.2f} asr {asr:.2f}")
        return TSBDResult("finetune", acc, asr)

    # ---------------- stage B: unlearning
    record_layer = record_layer or default_record_layer(params_o)
    checkpoint_dir = os.path.join(save_dir, "checkpoint")
    os.makedirs(checkpoint_dir, exist_ok=True)
    tx = optax.adam(lr_un)
    params = params_o
    opt_state = jitted_opt_init(tx, params)
    loader = {"clean_val": data.clean_val, "clean_test": data.clean_test, "poison_test": data.bd_test}[data_type]

    n_neurons = get_leaf(params, record_layer).shape[-1]
    grad_rows_avg, grad_rows_var = [], []
    if first_batch_only:
        # Device-resident until-floor loop: one compile, one dispatch.
        from audiobd_tpu.defend.common import device_dataset

        loop = make_unlearn_loop(model, tx, record_layer, data_type, unlearn_epochs)
        loader_dev = device_dataset(loader)
        evals = {
            "clean_val": _eval_plan(data.clean_val, bs),
            "clean_test": _eval_plan(data.clean_test, bs),
            "poison_test": _eval_plan(data.bd_test, bs),
        }
        key = rnd.named_key(cfg.train.seed, "tsbd_unlearn")
        params, opt_state, n_epochs, rows = loop(
            params, opt_state, batch_stats, (loader_dev.feats, loader_dev.labels),
            min(bs, loader_dev.n), evals, key,
        )
        rows = np.asarray(jax.device_get(rows))[: int(n_epochs)]
        for row in rows:
            head = [int(row[0])] + [float(v) for v in row[1:6]]
            grad_rows_avg.append(head + row[6:].tolist())
            grad_rows_var.append(head + [0.0] * n_neurons)  # var of one batch
            if verbose:
                print(f"unlearn {head[0]}: acc {100*head[3]:.2f} asr {100*head[4]:.2f} val {100*head[5]:.2f}")
    else:
        params, opt_state = _host_unlearn(
            model, tx, unlearn_epochs, loader, data, data_type, bs, cfg,
            record_layer, params, opt_state, batch_stats, tester,
            grad_rows_avg, grad_rows_var, verbose,
        )
    _stage(f"stage B unlearning done ({len(grad_rows_avg)} epochs)")
    header = ["Epoch", "train_loss", "train_acc", "test_acc", "test_asr", "val_acc"] + [
        f"neuron_{i}" for i in range(n_neurons)
    ]
    write_csv(os.path.join(checkpoint_dir, f"grad_avg_{record_layer.replace('/', '.')}.csv"), header, grad_rows_avg)
    write_csv(os.path.join(checkpoint_dir, f"grad_var_{record_layer.replace('/', '.')}.csv"), header, grad_rows_var)

    # ---------------- stage C: NWC
    nwc, n2w = neuron_weight_changes(params, params_o, "conv")
    with open(os.path.join(checkpoint_dir, "ucn.txt"), "w") as f:
        f.write("No \t Layer_Name \t Neuron_Idx \t Score \n")
        for count, (layer, idx, value) in enumerate(nwc):
            f.write(f"{count} \t {layer} \t {idx} \t {value:.4f} \n")
    with open(os.path.join(checkpoint_dir, "n2w_dict.json"), "w") as f:
        json.dump(n2w, f)
    np.savez(
        os.path.join(checkpoint_dir, "unlearned_model.npz"),
        **{name: np.asarray(leaf) for name, leaf in _named_leaves(params)},
    )

    _stage("stage C NWC done")
    # ---------------- stage D: reinit + fine-tune per ratio
    ranked = sorted(nwc, key=lambda rec: rec[2], reverse=True)
    prune_csv = os.path.join(save_dir, "pruning_data.csv")
    ft_csv = os.path.join(save_dir, "finetuning_data.csv")
    for path in (prune_csv, ft_csv):
        if os.path.exists(path):
            os.remove(path)
    per_ratio = []
    # One tx instance for every ratio: optimizer state still resets per call
    # (finetune_epochs tx.init's), but the jitted epoch program is shared —
    # one tunnel compile for all ratios instead of one each.
    tx_ft = optax.adam(lr_ft)
    ratios = list(reinit_ratios or REINIT_RATIOS)
    if vectorized_ft:
        # All ratios' fine-tunes as ONE vmapped+scanned program (see
        # make_stage_d_fn) — the host loop below costs ~700 tunnel round
        # trips; this path costs one.
        from audiobd_tpu.defend.common import device_dataset
        from audiobd_tpu.train.scan_epoch import make_perm, pad_plan

        reinit_list = [
            zero_reinit_weight(params_o, ranked[: int(len(ranked) * r)], n2w, reinit_weight_ratio)
            for r in ratios
        ]
        # Host stacking: the reinit trees are numpy (checkpoint restore +
        # host param surgery); jnp.stack here ran 3 eager remote ops per
        # leaf. np.stack is free and the stack enters the device once, as a
        # stage_d argument.
        params_stack = jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *reinit_list)
        val_dev = device_dataset(data.clean_val)
        bs_val = min(bs, val_dev.n)
        nb, mask1 = pad_plan(val_dev.n, bs_val)
        np_rng = rnd.np_rng(cfg.train.seed, "defense_ft")  # the host-loop stream
        n_epochs = ft_epochs + 1
        perms = np.stack([make_perm(np_rng, val_dev.n, nb, bs_val) for _ in range(n_epochs)])
        masks = np.broadcast_to(mask1, (n_epochs,) + mask1.shape)
        key = rnd.named_key(cfg.train.seed, "defense_ft_dropout")
        stage_d = make_stage_d_fn(model, tx_ft)
        pre_rows, ft_rows = jax.device_get(stage_d(
            params_stack, batch_stats,
            (val_dev.feats, val_dev.labels, val_dev.indicators),
            jnp.asarray(perms), jnp.asarray(masks), key,
            _eval_plan(data.clean_test, bs), _eval_plan(data.bd_test_complete, bs),
        ))

        def unpack(row):
            closs, bloss = float(row[0]), float(row[1])
            acc = 100.0 * row[2] / max(row[3], 1.0)
            asr = 100.0 * row[8] / max(row[9], 1.0)
            return float(acc), float(asr), closs, bloss

        for i, ratio in enumerate(ratios):
            acc, asr, closs, bloss = unpack(pre_rows[i])
            append_csv_row(prune_csv, [ratio, closs, bloss, acc, asr])
            if verbose:
                print(f"reinit ratio {ratio}: acc {acc:.2f} asr {asr:.2f}")
            for epoch in range(0, n_epochs, 10):
                acc, asr, closs, bloss = unpack(ft_rows[i, epoch])
                append_csv_row(ft_csv, [ratio, epoch, closs, bloss, acc, asr])
            per_ratio.append((ratio, acc, asr))
    else:
        for ratio in ratios:
            top_num = int(len(ranked) * ratio)
            reinit_params = zero_reinit_weight(params_o, ranked[:top_num], n2w, reinit_weight_ratio)
            acc, asr, closs, bloss = full_tester(reinit_params, batch_stats, data.clean_test, data.bd_test_complete)
            append_csv_row(prune_csv, [ratio, closs, bloss, acc, asr])
            if verbose:
                print(f"reinit ratio {ratio}: acc {acc:.2f} asr {asr:.2f}")

            last = {}

            def test_every_10(epoch, p, bstats, _ratio=ratio, _last=last):
                if epoch % 10 == 0:
                    acc, asr, closs, bloss = full_tester(p, bstats, data.clean_test, data.bd_test_complete)
                    append_csv_row(ft_csv, [_ratio, epoch, closs, bloss, acc, asr])
                    _last["acc"], _last["asr"] = acc, asr

            # One Adam instance + one shuffle stream across all ft_epochs+1
            # epochs, matching the reference's single optimizer (tsbd.py:382-404).
            finetune_epochs(
                model, reinit_params, batch_stats, data.clean_val,
                tx_ft, epochs=ft_epochs + 1, batch_size=bs,
                seed=cfg.train.seed, on_epoch=test_every_10,
            )
            per_ratio.append((ratio, last["acc"], last["asr"]))
    _stage("stage D fine-tunes done")
    prepend_csv_header(prune_csv, ["ratio", "clean_test_loss", "bd_test_loss", "test_clean_acc", "test_asr"])
    prepend_csv_header(ft_csv, ["ratio", "epoch", "clean_test_loss", "bd_test_loss", "test_clean_acc", "test_asr"])
    return TSBDResult("full", per_ratio[-1][1], per_ratio[-1][2], per_ratio)


def _named_leaves(tree: dict, path: tuple = ()):
    for key, value in tree.items():
        if isinstance(value, dict):
            yield from _named_leaves(value, path + (key,))
        else:
            yield "/".join(path + (key,)), value


def zero_reinit_weight(params_o: dict, top_neurons: list, n2w: dict, wratio: float) -> dict:
    """Zero the top-``wratio`` largest-|Δw| weights across the selected
    neurons (reference zero_reinit_weight, tsbd.py:49-63).

    Pure host numpy on purpose: the per-ratio selections have unique index
    shapes, so device scatter ops here compiled a fresh program per
    ratio x layer (~30-70 s each over a remote-attached chip — measured, it
    was most of the stage C->D gap). Params are tiny; the numpy scatter is
    free and the result enters the device exactly once, at the stage-D
    params stack."""
    merged = []
    for layer, idx, _ in top_neurons:
        merged += n2w[f"{layer}.{idx}"]
    if not merged:
        return params_o
    reinit = sorted(merged, reverse=True)[: int(len(merged) * wratio)]
    if not reinit:
        return params_o
    threshold = min(reinit)
    params = params_o
    for layer, idx, _ in top_neurons:
        changes = np.asarray(n2w[f"{layer}.{idx}"])
        sel = np.flatnonzero(changes >= threshold)
        if sel.size == 0:
            continue
        kernel = np.array(get_leaf(params, layer))  # host copy
        flat = kernel.reshape(-1, kernel.shape[-1])
        flat[sel, idx] = 0.0
        params = set_leaf(params, layer, flat.reshape(kernel.shape))
    return params
