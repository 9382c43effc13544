"""FlowMur `--flowmur_restarts` TPU demonstration (round-5 mitigation).

The round-5 diagnosis (VALIDATION.md) root-caused the attack's 3-of-5-seed
failure to the victim's parameter initialization, with a secondary lever in
per-seed trigger variance (cross1: peaks 42.6-91.7 under the receptive
victim 35). ``poison/flowmur.select_trigger`` runs K trigger-opt restarts
ranked by a 10-epoch probe victim; its docstring predicts two outcomes this
script measures live, one seed each:

  - seed 35 (receptive init): restarts should select a trigger with final
    ASR >= the single-opt baseline (study row: final 76.7 / peak 93.4);
  - seed 36 (non-receptive init): restarts cannot rescue the victim
    (study row: final 5.6 / peak 16.3) — documented limitation.

Protocol mirrors scripts/flowmur_seed_study.py exactly (full reference
budget, fixed seed-35 synthetic data, only cfg.train.seed varies) so rows
are directly comparable with flowmur_seed_study_r4.jsonl's unfused arm.

Run on the TPU fixture:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/flowmur_restarts_demo.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _flowmur_common as common  # noqa: E402  (fixture preamble side effects)

from audiobd_tpu.configs import make_config  # noqa: E402
from audiobd_tpu.data.speech_commands import make_synthetic_clean_data  # noqa: E402
from audiobd_tpu.poison import flowmur  # noqa: E402
from audiobd_tpu.train.trainer import train_attack  # noqa: E402

SEEDS = [int(s) for s in os.environ.get("DEMO_SEEDS", "35,36").split(",")]
RESTARTS = int(os.environ.get("DEMO_RESTARTS", "3"))
OUT = os.environ.get("DEMO_OUT", common.repo_path("flowmur_restarts_demo_r5.jsonl"))


def one_run(seed: int) -> dict:
    cfg = make_config(
        "flowmur", seed=seed, flowmur_restarts=RESTARTS,
        result=f"flowmur_restarts_{seed}",
    )
    clean = make_synthetic_clean_data(cfg, n_per_class=500)  # data fixed: seed 35
    t0 = time.time()
    model, state = flowmur.pretrain_surrogate(cfg, clean, verbose=False)
    hosts = flowmur.select_trigger_hosts(cfg, clean)
    trigger = flowmur.select_trigger(cfg, model, state, hosts, clean, verbose=True)
    poisoned = flowmur.poison(cfg, clean, trigger, save=False)
    res = train_attack(
        cfg, poisoned.bd_train, poisoned.clean_test, poisoned.bd_test,
        verbose=False, save=False,
    )
    return {
        "seed": seed,
        "restarts": RESTARTS,
        "victim_epochs": res.epochs_ran,
        "clean_acc": round(res.history["test_clean_acc"][-1], 2),
        "asr_final": round(res.history["test_asr"][-1], 2),
        "asr_peak": round(max(res.history["test_asr"]), 2),
        "wall_sec": round(time.time() - t0, 1),
    }


def main():
    done = common.done_rows(OUT, ("seed",))
    for seed in SEEDS:
        if (seed,) in done:
            print(f"seed {seed}: already recorded, skipping", file=sys.stderr)
            continue
        common.append_row(OUT, one_run(seed))


if __name__ == "__main__":
    main()
