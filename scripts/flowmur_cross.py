"""FlowMur trigger x victim cross-attribution (VERDICT r4 item 2, part 2).

flowmur_diagnosis_r5.jsonl established that the 3-of-5-seed ASR failure is
NOT early stopping: with the stopper disabled the failing seeds never form a
backdoor in 300 epochs (peak ASR <= 20), while succeeding seeds hold 73-92.
Remaining candidates: (a) the optimized TRIGGER itself is seed-lottery, or
(b) the victim-side randomness (poison row/position selection, victim init
and shuffles) is. This crosses them: train a victim under seed B's full
victim-side randomness with the trigger optimized under seed A.

If failure follows the trigger row-wise (trigger_36 fails under every victim
seed; trigger_35 succeeds under every victim seed) the attack's variance is
in trigger optimization, and the mitigation is restarts/selection there. If
it follows the victim seed column-wise, it's training dynamics.

Run on the TPU fixture:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/flowmur_cross.py
Env: CROSS_TRIGGER_SEEDS (default "35,36"), CROSS_VICTIM_SEEDS (default
"35,36"), CROSS_EPOCHS (default 120 — peak forms by ~103 on succeeding
seeds and failures are flat, so 120 bounds the answer at 40% of the
diagnosis cost), CROSS_OUT (default flowmur_cross_r5.jsonl, resumable).
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

TRIGGER_SEEDS = [int(s) for s in os.environ.get("CROSS_TRIGGER_SEEDS", "35,36").split(",")]
VICTIM_SEEDS = [int(s) for s in os.environ.get("CROSS_VICTIM_SEEDS", "35,36").split(",")]
EPOCHS = int(os.environ.get("CROSS_EPOCHS", "120"))
OUT = os.environ.get("CROSS_OUT", common.repo_path("flowmur_cross_r5.jsonl"))
SMOKE = os.environ.get("CROSS_SMOKE", "") not in ("", "0")


def get_trigger(seed: int, clean) -> np.ndarray:
    """Trigger optimized under ``seed`` — cached under record/flowmur_diag_<seed>/.

    Smoke rehearsals cache under a separate name: a CROSS_SMOKE trigger
    (3-epoch surrogate, 5 opt epochs) silently feeding a later full-budget
    run — and cross2/cross3, which load the same path — would invalidate
    every cross-attribution row with no provenance marker.
    """
    fname = "trigger_smoke.npy" if SMOKE else "trigger.npy"
    cache = common.repo_path("record", f"flowmur_diag_{seed}", fname)
    if os.path.exists(cache):
        return np.load(cache)
    cfg = make_config(
        "flowmur", seed=seed, fused_conv_block="off", result=f"flowmur_diag_{seed}"
    )
    model, state = flowmur.pretrain_surrogate(
        cfg, clean, verbose=False, max_epochs=3 if SMOKE else None
    )
    hosts = flowmur.select_trigger_hosts(cfg, clean)
    trigger = flowmur.optimize_trigger(
        cfg, model, state, hosts, verbose=False, save_snapshots=False,
        epochs=5 if SMOKE else None,
    )
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    np.save(cache, trigger)
    return trigger


def one_cross(trigger_seed: int, victim_seed: int, clean, trigger) -> dict:
    cfg = make_config(
        "flowmur", seed=victim_seed, fused_conv_block="off",
        result=f"flowmur_cross_{trigger_seed}_{victim_seed}",
        num_epochs=6 if SMOKE else EPOCHS, patience=10**6,
    )
    t0 = time.time()
    poisoned = flowmur.poison(cfg, clean, trigger, save=False)
    res = train_attack(
        cfg, poisoned.bd_train, poisoned.clean_test, poisoned.bd_test,
        verbose=False, save=False,
    )
    asr = res.history["test_asr"]
    return {
        "trigger_seed": trigger_seed,
        "victim_seed": victim_seed,
        "epochs": res.epochs_ran,
        "asr_final": round(asr[-1], 2),
        "asr_peak": round(max(asr), 2),
        "asr_peak_epoch": int(np.argmax(asr)) + 1,
        "clean_acc_final": round(res.history["test_clean_acc"][-1], 2),
        "trigger_rms": round(float(np.sqrt(np.mean(trigger.astype(np.float64) ** 2))), 5),
        "wall_sec": round(time.time() - t0, 1),
    }


def main():
    done = common.done_rows(OUT, ("trigger_seed", "victim_seed"))
    for key in sorted(done):
        print(f"# resumed: {json.dumps(dict(zip(('trigger_seed', 'victim_seed'), key)))}",
              flush=True)
    cfg0 = make_config("flowmur", seed=35)
    clean = make_synthetic_clean_data(cfg0, n_per_class=50 if SMOKE else 500)
    triggers = {}
    for ts in TRIGGER_SEEDS:
        if all((ts, vs) in done for vs in VICTIM_SEEDS):
            continue
        triggers[ts] = get_trigger(ts, clean)
    for ts in TRIGGER_SEEDS:
        for vs in VICTIM_SEEDS:
            if (ts, vs) in done:
                continue
            common.append_row(OUT, one_cross(ts, vs, clean, triggers[ts]))


if __name__ == "__main__":
    main()
