"""Defense integration tests.

One BadNets attack run (module-scoped) produces the record/ artifacts; each
defense then runs on them end-to-end, asserting its specific contract:
  * FP: pruning reduces ASR substantially while retaining clean accuracy
    within the tolerance; CSVs written.
  * TSBD finetune branch + full unlearn/reinit path: unlearning floors
    accuracy; NWC artifacts produced; reinit changes ASR.
  * FT-reg: scoring produces a full score vector; pruning CSVs written.
  * Correlation: a valid Pearson r in [-1, 1] and the NWC CSV.
"""

import os

import numpy as np
import pytest

from audiobd_tpu.configs import make_config
from audiobd_tpu.data.speech_commands import make_synthetic_clean_data
from audiobd_tpu.defend import correlation, fp, ft_reg, tsbd
from audiobd_tpu.defend.common import load_bd_model, load_defense_data
from audiobd_tpu.poison import badnets
from audiobd_tpu.train.trainer import train_attack

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def attacked(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("defend_run")
    os.chdir(tmp)
    cfg = make_config(
        "badnets",
        result="bd_for_defense",
        model="smallcnn",
        num_epochs=8,
        batch_size=64,
        learning_rate=1e-3,
    )
    clean = make_synthetic_clean_data(cfg, n_per_class=24)
    from audiobd_tpu.data.speech_commands import save_clean_data

    save_clean_data(cfg, clean)  # defenses read the record/ npy contract
    poisoned = badnets.poison(cfg, clean, save=True)
    result = train_attack(cfg, poisoned.bd_train, poisoned.clean_test, poisoned.bd_test, verbose=False)
    assert result.history["test_asr"][-1] > 70.0
    data = load_defense_data(cfg, val_ratio=0.3)
    return cfg, data


def test_fp_mitigation(attacked):
    cfg, data = attacked
    result = fp.mitigation(cfg, data=data, acc_ratio=0.25, once_prune_ratio=0.1, verbose=False)
    assert os.path.exists(os.path.join(cfg.record_dir, "defense/fp/pruning_data.csv"))
    assert os.path.exists(os.path.join(cfg.record_dir, "defense/fp/ft_data.csv"))
    assert len(result.history) >= 1
    # Pruning history is monotone in pruned count.
    counts = [h[0] for h in result.history]
    assert counts == sorted(counts)


def test_tsbd_finetune_branch(attacked):
    cfg, data = attacked
    result = tsbd.mitigation(cfg, only_finetune=True, data=data, verbose=False)
    assert result.stage == "finetune"
    assert os.path.exists(os.path.join(cfg.record_dir, "defense/tsbd/finetuning_data.csv"))
    assert 0.0 <= result.test_acc <= 100.0


def test_tsbd_full_path(attacked):
    cfg, data = attacked
    result = tsbd.mitigation(
        cfg,
        only_finetune=False,
        data=data,
        unlearn_epochs=30,
        ft_epochs=1,
        reinit_ratios=[0.1, 0.5],
        first_batch_only=True,
        verbose=False,
    )
    assert result.stage == "full"
    ckpt = os.path.join(cfg.record_dir, "defense/tsbd/checkpoint")
    assert os.path.exists(os.path.join(ckpt, "ucn.txt"))
    assert os.path.exists(os.path.join(ckpt, "n2w_dict.json"))
    assert len(result.per_ratio) == 2


def test_tsbd_vectorized_ft_matches_loop(attacked):
    """The vmapped stage-D program (one dispatch for all ratios) must
    reproduce the per-ratio host fine-tune loop: same shuffle/dropout
    streams by construction, so the rows agree to float tolerance.

    Compares the programs directly on two reinit variants of the attacked
    model (running the full mitigation twice costs ~19 min on this 1-core
    host; `test_tsbd_full_path` covers the mitigation wiring with the
    vectorized default)."""
    import jax
    import jax.numpy as jnp
    import optax

    from audiobd_tpu.defend.common import (
        device_dataset, finetune_epochs, load_bd_model, make_full_tester,
        zero_neurons,
    )
    from audiobd_tpu.train.scan_epoch import make_perm, pad_plan
    from audiobd_tpu.utils import random as rnd

    cfg, data = attacked
    model, variables, _ = load_bd_model(cfg)
    params_o, batch_stats = variables["params"], variables["batch_stats"]
    layer = tsbd.default_record_layer(params_o)
    variants = [
        zero_neurons(params_o, [(layer, 0)]),
        zero_neurons(params_o, [(layer, 1), (layer, 2)]),
    ]
    bs = cfg.train.batch_size
    n_epochs = 12
    tx_ft = optax.adam(0.01)

    # --- vectorized: mirror of mitigation()'s vectorized_ft branch
    params_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *variants)
    val_dev = device_dataset(data.clean_val)
    bs_val = min(bs, val_dev.n)
    nb, mask1 = pad_plan(val_dev.n, bs_val)
    np_rng = rnd.np_rng(cfg.train.seed, "defense_ft")
    perms = np.stack([make_perm(np_rng, val_dev.n, nb, bs_val) for _ in range(n_epochs)])
    masks = np.broadcast_to(mask1, (n_epochs,) + mask1.shape)
    key = rnd.named_key(cfg.train.seed, "defense_ft_dropout")
    stage_d = tsbd.make_stage_d_fn(model, tx_ft)
    pre_rows, ft_rows = jax.device_get(stage_d(
        params_stack, batch_stats,
        (val_dev.feats, val_dev.labels, val_dev.indicators),
        jnp.asarray(perms), jnp.asarray(masks), key,
        tsbd._eval_plan(data.clean_test, bs), tsbd._eval_plan(data.bd_test_complete, bs),
    ))

    def unpack(row):
        return [100.0 * row[2] / max(row[3], 1.0), 100.0 * row[8] / max(row[9], 1.0),
                float(row[0]), float(row[1])]

    # --- loop: the pre-existing per-variant host path
    full_tester = make_full_tester(model, bs)
    for i, reinit_params in enumerate(variants):
        acc0, asr0, closs0, bloss0 = full_tester(
            reinit_params, batch_stats, data.clean_test, data.bd_test_complete
        )
        np.testing.assert_allclose(
            unpack(pre_rows[i]), [acc0, asr0, closs0, bloss0], rtol=5e-3, atol=5e-3
        )
        rows_loop = {}

        def on_epoch(epoch, p, bstats, _rows=rows_loop):
            if epoch % 10 == 0:
                _rows[epoch] = full_tester(p, bstats, data.clean_test, data.bd_test_complete)

        finetune_epochs(
            model, reinit_params, batch_stats, data.clean_val,
            tx_ft, epochs=n_epochs, batch_size=bs, seed=cfg.train.seed,
            on_epoch=on_epoch,
        )
        # vmap batching reassociates reductions, so losses drift slightly
        # after 10 training epochs; accuracies are count ratios and may flip
        # on borderline logits — allow up to two flipped samples' worth
        # (acc/asr move in steps of 100/n when one prediction flips).
        flip = 2 * 100.0 / max(float(pre_rows[i][3]), 1.0)
        for epoch in (0, 10):
            acc, asr, closs, bloss = rows_loop[epoch]
            got = unpack(ft_rows[i, epoch])
            np.testing.assert_allclose(got[:2], [acc, asr], atol=flip)
            np.testing.assert_allclose(got[2:], [closs, bloss], rtol=5e-3, atol=5e-3)


def test_ft_reg_mitigation(attacked):
    cfg, data = attacked
    result = ft_reg.mitigation(
        cfg, data=data, reg_epochs=3, prune_ratios=[0.1, 0.5], verbose=False
    )
    assert len(result.per_ratio) == 2
    from audiobd_tpu.defend.common import neuron_weight_norms

    _, variables, _ = load_bd_model(cfg)[0:3]
    _, neurons = neuron_weight_norms(variables["params"], "conv")
    assert result.scores.shape == (len(neurons),)
    assert os.path.exists(os.path.join(cfg.record_dir, "defense/ft_reg/pruning_data.csv"))


def test_correlation_analysis(attacked):
    cfg, data = attacked
    result = correlation.analyze(cfg, data=data, unlearn_epochs=5, verbose=False)
    assert -1.0 <= result.pearson_r <= 1.0
    assert result.clean_nwc.shape == result.bd_nwc.shape
    assert result.clean_nwc.sum() > 0  # unlearning moved weights
    assert os.path.exists(os.path.join(cfg.record_dir, "defense/correlation/nwc_correlation.csv"))


def test_tsbd_host_unlearn_path(attacked):
    """first_batch_only=False takes the host multi-batch loop (per-epoch grad
    statistics need host accumulation) — same contract as the device loop."""
    cfg, data = attacked
    result = tsbd.mitigation(
        cfg,
        only_finetune=False,
        data=data,
        unlearn_epochs=3,
        ft_epochs=1,
        reinit_ratios=[0.1],
        first_batch_only=False,
        verbose=False,
    )
    assert result.stage == "full"
    import csv
    import glob

    ckpt = os.path.join(cfg.record_dir, "defense/tsbd/checkpoint")
    avg_csvs = glob.glob(os.path.join(ckpt, "grad_avg_*.csv"))
    var_csvs = glob.glob(os.path.join(ckpt, "grad_var_*.csv"))
    assert avg_csvs and var_csvs
    with open(avg_csvs[0]) as f:
        rows = list(csv.reader(f))
    # header + at least one recorded unlearn-epoch row
    assert len(rows) >= 2
