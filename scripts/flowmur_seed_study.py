"""FlowMur fused-vs-unfused ASR seed study (VERDICT r2 item 3).

Round 2 recorded one fused full-budget run at final ASR 70 vs 93.2 unfused
and called it run variance with n=1 per arm. This script runs >=5 seeds per
arm at the full reference budget (300 trigger-opt epochs, 5000 clips,
3 surrogate restarts, victim to early stop) and prints one JSON row per run;
the distribution decides the shipping `fused` default for this attack.

Run on the TPU fixture:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/flowmur_seed_study.py
Data is the fixed seed-35 synthetic separable dataset in every run; only
cfg.train.seed varies (surrogate init/shuffles, trigger-opt streams, victim
training) — the same protocol as VALIDATION.md r2.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _flowmur_common as common  # noqa: E402  (fixture preamble side effects)

import numpy as np  # noqa: E402

from audiobd_tpu.configs import make_config  # noqa: E402
from audiobd_tpu.data.speech_commands import make_synthetic_clean_data  # noqa: E402
from audiobd_tpu.poison import flowmur  # noqa: E402
from audiobd_tpu.train.trainer import train_attack  # noqa: E402

SEEDS = [35, 36, 37, 38, 39]
# Repo-resident by default: /tmp is wiped on fixture reboots, which stranded
# the r3 study's resume state. Rows in the repo survive and get committed.
OUT = os.environ.get("STUDY_OUT", common.repo_path("flowmur_seed_study_r4.jsonl"))


def one_run(fused: str, seed: int) -> dict:
    cfg = make_config(
        "flowmur", seed=seed, fused_conv_block=fused,
        result=f"flowmur_study_{fused}_{seed}",
    )
    clean = make_synthetic_clean_data(cfg, n_per_class=500)  # data fixed: seed 35
    t0 = time.time()
    model, state = flowmur.pretrain_surrogate(cfg, clean, verbose=False)
    hosts = flowmur.select_trigger_hosts(cfg, clean)
    trigger = flowmur.optimize_trigger(
        cfg, model, state, hosts, verbose=False, save_snapshots=False
    )
    poisoned = flowmur.poison(cfg, clean, trigger, save=False)
    res = train_attack(
        cfg, poisoned.bd_train, poisoned.clean_test, poisoned.bd_test,
        verbose=False, save=False,
    )
    return {
        "fused": fused,
        "seed": seed,
        "victim_epochs": res.epochs_ran,
        "clean_acc": round(res.history["test_clean_acc"][-1], 2),
        "asr_final": round(res.history["test_asr"][-1], 2),
        "asr_peak": round(max(res.history["test_asr"]), 2),
        "wall_sec": round(time.time() - t0, 1),
    }


def main():
    # Resume: rows already in OUT are kept, not re-run — the TPU tunnel can
    # drop mid-campaign and each arm costs minutes at full budget.
    rows = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            rows = [json.loads(line) for line in f if line.strip()]
        for r in rows:
            print(f"# resumed: {json.dumps(r)}", flush=True)
    done = {(r["fused"], r["seed"]) for r in rows}
    for fused in ("off", "on"):
        for seed in SEEDS:
            if (fused, seed) in done:
                continue
            row = one_run(fused, seed)
            rows.append(row)
            common.append_row(OUT, row)
    for fused in ("off", "on"):
        arm = [r["asr_final"] for r in rows if r["fused"] == fused]
        print(f"# fused={fused}: final ASR mean {np.mean(arm):.1f} "
              f"min {min(arm):.1f} max {max(arm):.1f}", flush=True)


if __name__ == "__main__":
    main()
