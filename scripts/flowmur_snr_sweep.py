"""FlowMur trigger-strength (SNR) sweep on a non-receptive victim init.

Round-5 follow-up to the init-lottery diagnosis (VALIDATION.md): the victim's
random init decides the attack at the reference trigger strength
(snr_db=30 — the trigger injected 30 dB below the host clip,
/root/reference/flowmur.py:31,80). This sweep asks whether the lottery is
SNR-dependent: does a louder trigger (lower snr_db — an attacker-controlled
knob in the paper's own sensitivity study) flip a failing init?

Protocol: seed fixed to a non-receptive init (36: r4 study final ASR 5.6 /
peak 7.9 at snr 30), everything else the seed-study protocol (fixed seed-35
synthetic data, full budgets), only cfg.snr_db varies. One JSONL row per
SNR; resumable.

Run on the TPU fixture:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/flowmur_snr_sweep.py
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

SEED = int(os.environ.get("SWEEP_SEED", "36"))
SNRS = [int(s) for s in os.environ.get("SWEEP_SNRS", "20,10,5").split(",")]
OUT = os.environ.get("SWEEP_OUT", common.repo_path("flowmur_snr_sweep_r5.jsonl"))


def one_run(snr_db: int) -> dict:
    cfg = make_config(
        "flowmur", seed=SEED, snr_db=snr_db,
        result=f"flowmur_snr{snr_db}_{SEED}",
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
        "seed": SEED,
        "snr_db": snr_db,
        "victim_epochs": res.epochs_ran,
        "clean_acc": round(res.history["test_clean_acc"][-1], 2),
        "asr_final": round(res.history["test_asr"][-1], 2),
        "asr_peak": round(max(res.history["test_asr"]), 2),
        "wall_sec": round(time.time() - t0, 1),
    }


def main():
    done = common.done_rows(OUT, ("seed", "snr_db"))
    for snr in SNRS:
        if (SEED, snr) in done:
            print(f"snr {snr}: already recorded, skipping", file=sys.stderr)
            continue
        common.append_row(OUT, one_run(snr))


if __name__ == "__main__":
    main()
