"""Unlearning correlation analysis (reference correlation_analysis.py:41-172).

Unlearn two copies of the attacked model — one on clean-test data, one on
backdoored-test data (same shuffled index subsets) — compute each copy's
per-neuron weight change (NWC) vs the original, and report the Pearson
correlation between the two NWC vectors (the TSBD paper's motivating
evidence), plus a CSV and scatter plot.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np
import optax

from audiobd_tpu.configs import AttackConfig
from audiobd_tpu.defend.common import (
    DefenseData,
    load_bd_model,
    load_defense_data,
    neuron_weight_changes,
)
from audiobd_tpu.defend.tsbd import make_unlearn_step, default_record_layer
from audiobd_tpu.train.loop import ArraySet, iter_batches, make_batch
from audiobd_tpu.utils import random as rnd
from audiobd_tpu.utils.logging import write_csv


def _unlearn(model, params0, batch_stats, data: ArraySet, record_layer, lr, epochs, bs, seed,
             first_batch_only=True):
    tx = optax.adam(lr)
    step = make_unlearn_step(model, tx)
    params = params0
    from audiobd_tpu.train.state import jitted_opt_init

    opt_state = jitted_opt_init(tx, params)
    np_rng = rnd.np_rng(seed, "corr_unlearn")
    for _ in range(epochs):
        for idx, mask in iter_batches(len(data), min(bs, len(data)), np_rng, shuffle=True):
            batch = make_batch(data.feats, data.labels, data.indicators, idx, mask)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            params, opt_state, _loss, _acc, _gn = step(params, opt_state, batch_stats, batch, record_layer)
            if first_batch_only:
                break
    return params


@dataclass
class CorrelationResult:
    pearson_r: float
    clean_nwc: np.ndarray
    bd_nwc: np.ndarray


def analyze(
    cfg: AttackConfig,
    lr_un: float = 1e-4,
    unlearn_epochs: int = 10,
    subset: int | None = None,
    data: DefenseData | None = None,
    verbose: bool = True,
) -> CorrelationResult:
    save_dir = os.path.join(cfg.record_dir, "defense", "correlation")
    os.makedirs(save_dir, exist_ok=True)
    data = data or load_defense_data(cfg)
    model, variables, spec = load_bd_model(cfg)
    params_o, batch_stats = variables["params"], variables["batch_stats"]
    bs = cfg.train.batch_size
    record_layer = default_record_layer(params_o)

    # Same shuffled subset indices for both sides (reference uses the same
    # shuffled index lists for the clean and bd loaders).
    rng = rnd.np_rng(cfg.train.seed, "corr_subset")
    n = min(len(data.clean_test), len(data.bd_test))
    idx = rng.permutation(n)[: subset or n]
    clean_sub = ArraySet(data.clean_test.feats[idx], data.clean_test.labels[idx])
    bd_sub = ArraySet(data.bd_test.feats[idx], data.bd_test.labels[idx])

    p_clean = _unlearn(model, params_o, batch_stats, clean_sub, record_layer,
                       lr_un, unlearn_epochs, bs, cfg.train.seed)
    p_bd = _unlearn(model, params_o, batch_stats, bd_sub, record_layer,
                    lr_un, unlearn_epochs, bs, cfg.train.seed)

    nwc_clean, _ = neuron_weight_changes(p_clean, params_o, "conv")
    nwc_bd, _ = neuron_weight_changes(p_bd, params_o, "conv")
    v_clean = np.asarray([rec[2] for rec in nwc_clean])
    v_bd = np.asarray([rec[2] for rec in nwc_bd])
    r = float(np.corrcoef(v_clean, v_bd)[0, 1])

    write_csv(
        os.path.join(save_dir, "nwc_correlation.csv"),
        ["layer", "neuron", "clean_nwc", "bd_nwc"],
        [(rec[0], rec[1], rec[2], b[2]) for rec, b in zip(nwc_clean, nwc_bd)],
    )
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(6, 6))
        plt.scatter(v_clean, v_bd, s=12, alpha=0.6)
        plt.xlabel("NWC (clean unlearning)")
        plt.ylabel("NWC (backdoor unlearning)")
        plt.title(f"Pearson r = {r:.3f}")
        plt.savefig(os.path.join(save_dir, "nwc_scatter.png"), dpi=120, bbox_inches="tight")
        plt.close()
    except Exception as e:
        print(f"plot skipped: {e}")
    if verbose:
        print(f"NWC Pearson correlation: {r:.4f}")
    return CorrelationResult(r, v_clean, v_bd)
