"""Diagnose the FlowMur seed-bimodal ASR failure (VERDICT r4 item 2).

The round-4 seed study (flowmur_seed_study_r4.jsonl) found final ASR <= 7.2%
on 3 of 5 seeds at the full reference budget, correlating perfectly with the
victim early-stopping fast (24-30 epochs fail, 52-73 succeed). Candidate
causes, in the order this script separates them:

  (a) the early-stop monitor 0.5*(clean+bd loss) — quirk 6b.10, identical to
      the reference (flowmur.py:156 / badnets.py:156 lineage) — halts the
      victim before the (clean-label, slow-forming) backdoor is learned;
  (b) trigger-optimization variance: the optimized trigger itself is weak on
      the failing seeds (visible as a worse final opt loss and a low
      surrogate-transfer ASR *before* any victim training);
  (c) inherent attack property the reference shares.

Protocol: for each seed, run the full pipeline ONCE with early stopping
disabled (num_epochs=300, patience=10^6) and record per-epoch trajectories.
The patience-20 outcome is then *simulated offline* from the monitor
trajectory — one run yields both arms exactly (the stopper is deterministic
in the monitor series). Extras captured per seed: the 300-epoch trigger-opt
loss curve and the surrogate-transfer ASR of the final trigger (fraction of
bd_test clips the surrogate itself sends to the target class — a
victim-independent trigger-strength probe).

Run on the TPU fixture (~6 min/seed):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/flowmur_diagnose.py
Outputs: one JSON summary row per seed on stdout (appended to
flowmur_diagnosis_r5.jsonl) + full trajectories in
record/flowmur_diag_<seed>/trajectory.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _flowmur_common as common  # noqa: E402  (fixture preamble side effects)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from audiobd_tpu.configs import make_config  # noqa: E402
from audiobd_tpu.data.speech_commands import make_synthetic_clean_data  # noqa: E402
from audiobd_tpu.poison import flowmur  # noqa: E402
from audiobd_tpu.train.trainer import train_attack  # noqa: E402

SEEDS = [int(s) for s in os.environ.get("DIAG_SEEDS", "35,36,39").split(",")]
OUT = os.environ.get("DIAG_OUT", common.repo_path("flowmur_diagnosis_r5.jsonl"))
MAX_EPOCHS = int(os.environ.get("DIAG_EPOCHS", "300"))
# DIAG_SMOKE=1: tiny budgets for a CPU dress rehearsal of the whole script
# (n_per_class 50, 3 surrogate epochs, 5 opt epochs, 6 victim epochs).
SMOKE = os.environ.get("DIAG_SMOKE", "") not in ("", "0")


def simulate_early_stop(monitor: list[float], patience: int = 20) -> int:
    """Replicate train/loop.py::EarlyStopping on a recorded monitor series.

    Returns the 1-based epoch at which training would have stopped (the
    epoch whose eval trips counter == patience), or len(monitor) if it never
    trips — bit-for-bit the stopper's arithmetic (delta=0, strict <)."""
    best, counter = None, 0
    for i, v in enumerate(monitor, start=1):
        if best is None or v < best:
            best, counter = v, 0
        else:
            counter += 1
            if counter >= patience:
                return i
    return len(monitor)


def surrogate_transfer_asr(cfg, model, state, bd_test) -> float:
    """Fraction of trigger-injected bd_test clips the SURROGATE classifies as
    the target — trigger strength before any victim training."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    feats = bd_test.feats if isinstance(bd_test.feats, jax.Array) else jnp.asarray(bd_test.feats)
    logits = jax.jit(lambda f: model.apply(variables, f, train=False))(feats)
    pred = np.asarray(jnp.argmax(logits, -1))
    return float((pred == cfg.target_label).mean() * 100.0)


def one_seed(seed: int) -> dict:
    cfg = make_config(
        "flowmur", seed=seed, fused_conv_block="off",
        result=f"flowmur_diag_{seed}",
        num_epochs=6 if SMOKE else MAX_EPOCHS, patience=10**6,  # early stop disabled
    )
    clean = make_synthetic_clean_data(cfg, n_per_class=50 if SMOKE else 500)
    t0 = time.time()
    model, state = flowmur.pretrain_surrogate(
        cfg, clean, verbose=False, max_epochs=3 if SMOKE else None
    )
    hosts = flowmur.select_trigger_hosts(cfg, clean)
    opt_losses: list = []
    trigger = flowmur.optimize_trigger(
        cfg, model, state, hosts, verbose=False, save_snapshots=False,
        loss_history=opt_losses, epochs=5 if SMOKE else None,
    )
    opt_losses = [float(x) for x in np.asarray(jnp.stack(opt_losses))]
    poisoned = flowmur.poison(cfg, clean, trigger, save=False)
    surr_asr = surrogate_transfer_asr(cfg, model, state, poisoned.bd_test)
    res = train_attack(
        cfg, poisoned.bd_train, poisoned.clean_test, poisoned.bd_test,
        verbose=False, save=False,
    )
    h = res.history
    monitor = [0.5 * (c + b) for c, b in zip(h["test_clean_loss"], h["test_bd_loss"])]
    stop_ep = simulate_early_stop(monitor, patience=20)
    asr = h["test_asr"]
    row = {
        "seed": seed,
        "opt_loss_first": round(opt_losses[0], 2),
        "opt_loss_last": round(opt_losses[-1], 4),
        "surrogate_transfer_asr": round(surr_asr, 2),
        "epochs_ran": res.epochs_ran,
        "sim_stop_epoch_p20": stop_ep,
        "asr_at_sim_stop": round(asr[stop_ep - 1], 2),
        "asr_final": round(asr[-1], 2),
        "asr_peak": round(max(asr), 2),
        "asr_peak_epoch": int(np.argmax(asr)) + 1,
        "clean_acc_final": round(h["test_clean_acc"][-1], 2),
        "train_asr_final": round(h["train_asr"][-1], 2),
        "wall_sec": round(time.time() - t0, 1),
    }
    os.makedirs(cfg.record_dir, exist_ok=True)
    with open(os.path.join(cfg.record_dir, "trajectory.json"), "w") as f:
        json.dump({"opt_losses": opt_losses, "monitor": monitor, **h}, f)
    return row


def main():
    done = common.done_rows(OUT, ("seed",))
    for seed in SEEDS:
        if (seed,) in done:
            continue
        common.append_row(OUT, one_seed(seed))


if __name__ == "__main__":
    main()
