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

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from audiobd_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache("auto")

import jax  # noqa: E402

if os.environ.get("AUDIOBD_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["AUDIOBD_PLATFORM"])

from audiobd_tpu.configs import make_config  # noqa: E402
from audiobd_tpu.data.speech_commands import make_synthetic_clean_data  # noqa: E402
from audiobd_tpu.poison import flowmur  # noqa: E402
from audiobd_tpu.train.trainer import train_attack  # noqa: E402

SEEDS = [int(s) for s in os.environ.get("DEMO_SEEDS", "35,36").split(",")]
RESTARTS = int(os.environ.get("DEMO_RESTARTS", "3"))
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get(
    "DEMO_OUT", os.path.join(_REPO, "flowmur_restarts_demo_r5.jsonl")
)


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
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                if line.strip():
                    done.add(json.loads(line)["seed"])
    for seed in SEEDS:
        if seed in done:
            print(f"seed {seed}: already recorded, skipping", file=sys.stderr)
            continue
        row = one_run(seed)
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row))


if __name__ == "__main__":
    main()
