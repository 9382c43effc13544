"""FlowMur victim-side attribution: poison selection vs training stream.

flowmur_cross_r5.jsonl showed failure follows the VICTIM seed, not the
trigger (trigger_35: peak ASR 91.7 under victim 35 but 8.4/16.1 under
victims 36/39). The victim seed feeds two independent random levers:

  poison_seed — rnd.np_rng(seed, "flowmur_poison"): WHICH target-class rows
                get injected and WHERE in the clip the trigger lands;
  train_seed  — victim init (named_key(seed, "params")), dropout stream,
                shuffle order.

This crosses them with the trigger FIXED (seed 35's cached trigger.npy).
If failure follows poison_seed, the attack hinges on the injected
row/position draw; if it follows train_seed, on victim initialization —
each implies a different (flagged) mitigation.

Run on the TPU fixture:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/flowmur_cross2.py
Env: CROSS2_POISON_SEEDS / CROSS2_TRAIN_SEEDS (default "35,36,39" each),
CROSS2_EPOCHS (120), CROSS2_OUT (flowmur_cross2_r5.jsonl, resumable).
"""

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

POISON_SEEDS = [int(s) for s in os.environ.get("CROSS2_POISON_SEEDS", "35,36,39").split(",")]
TRAIN_SEEDS = [int(s) for s in os.environ.get("CROSS2_TRAIN_SEEDS", "35,36,39").split(",")]
EPOCHS = int(os.environ.get("CROSS2_EPOCHS", "120"))
TRIGGER_SEED = int(os.environ.get("CROSS2_TRIGGER_SEED", "35"))
OUT = os.environ.get("CROSS2_OUT", common.repo_path("flowmur_cross2_r5.jsonl"))
SMOKE = os.environ.get("CROSS2_SMOKE", "") not in ("", "0")


def main():
    done = common.done_rows(OUT, ("poison_seed", "train_seed"))
    trig_path = common.repo_path("record", f"flowmur_diag_{TRIGGER_SEED}", "trigger.npy")
    trigger = np.load(trig_path)
    cfg0 = make_config("flowmur", seed=35)
    clean = make_synthetic_clean_data(cfg0, n_per_class=50 if SMOKE else 500)
    for ps in POISON_SEEDS:
        cfg_p = make_config("flowmur", seed=ps)
        poisoned = None
        for ts in TRAIN_SEEDS:
            if (ps, ts) in done:
                continue
            if poisoned is None:
                poisoned = flowmur.poison(cfg_p, clean, trigger, save=False)
            cfg_t = make_config(
                "flowmur", seed=ts, fused_conv_block="off",
                result=f"flowmur_cross2_{ps}_{ts}",
                num_epochs=6 if SMOKE else EPOCHS, patience=10**6,
            )
            t0 = time.time()
            res = train_attack(
                cfg_t, poisoned.bd_train, poisoned.clean_test, poisoned.bd_test,
                verbose=False, save=False,
            )
            asr = res.history["test_asr"]
            row = {
                "poison_seed": ps,
                "train_seed": ts,
                "trigger_seed": TRIGGER_SEED,
                "asr_final": round(asr[-1], 2),
                "asr_peak": round(max(asr), 2),
                "asr_peak_epoch": int(np.argmax(asr)) + 1,
                "clean_acc_final": round(res.history["test_clean_acc"][-1], 2),
                "wall_sec": round(time.time() - t0, 1),
            }
            common.append_row(OUT, row)


if __name__ == "__main__":
    main()
