"""FlowMur attack entry point (reference flowmur.py CLI surface).

Unlike the reference's live path — which loads pre-computed surrogate/trigger
artifacts and keeps the generating calls commented out (flowmur.py:53-54,
66-67) — both stages run for real here, with ``--load_surrogate`` /
``--load_trigger`` to reuse cached artifacts.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from audiobd_tpu.configs import add_common_args, config_from_args
from audiobd_tpu.utils.compile_cache import enable_compilation_cache
from audiobd_tpu.data.speech_commands import (
    load_clean_data,
    make_synthetic_clean_data,
    save_clean_data,
)
from audiobd_tpu.poison import flowmur
from audiobd_tpu.train.trainer import train_attack


def parse_arguments():
    parser = argparse.ArgumentParser(description="FlowMur audio backdoor attack (TPU)")
    add_common_args(parser)
    parser.add_argument("--trigger_duration", type=float, default=None)
    parser.add_argument("--snr_db", type=int, default=None)
    parser.add_argument("--surrogate_epochs", type=int, default=None)
    parser.add_argument("--opt_epochs", type=int, default=None)
    parser.add_argument("--load_trigger", type=str, default=None, help="path to sp_trigger npy")
    parser.add_argument(
        "--flowmur_update", type=str, default=None, choices=["per_batch", "accumulated"],
        help="trigger-opt update rule: independent per-batch Adam steps, or the "
             "reference's per-batch steps on the prefix-summed epoch gradient",
    )
    parser.add_argument(
        "--flowmur_restarts", type=int, default=None,
        help="trigger-opt restarts with probe-victim selection (1 = "
             "reference-faithful single opt; see poison/flowmur.select_trigger)",
    )
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--synthetic_per_class", type=int, default=50)
    return parser.parse_args()


def main():
    args = parse_arguments()
    cfg = config_from_args(
        "flowmur", args,
        trigger_duration=args.trigger_duration,
        snr_db=args.snr_db,
        surrogate_epochs=args.surrogate_epochs,
        flowmur_opt_epochs=args.opt_epochs,
        flowmur_restarts=args.flowmur_restarts,
    )
    enable_compilation_cache(cfg.train.compilation_cache)
    print("----------FlowMur attack (audiobd_tpu)----------")
    for key, value in vars(args).items():
        print(f"{key}: {value}")
    if args.synthetic:
        clean = make_synthetic_clean_data(cfg, n_per_class=args.synthetic_per_class)
        save_clean_data(cfg, clean)  # defenses read the clean npy cache
    else:
        clean = load_clean_data(cfg)

    print("Training surrogate model...")
    model, state = flowmur.pretrain_surrogate(cfg, clean)
    if args.load_trigger and os.path.exists(args.load_trigger):
        trigger = np.load(args.load_trigger).astype(np.float32)
        print(f"loaded trigger {args.load_trigger} {trigger.shape}")
    else:
        print("Generating optimal trigger...")
        hosts = flowmur.select_trigger_hosts(cfg, clean)
        trigger = flowmur.select_trigger(cfg, model, state, hosts, clean)
    poisoned = flowmur.poison(cfg, clean, trigger)
    result = train_attack(cfg, poisoned.bd_train, poisoned.clean_test, poisoned.bd_test)
    print(
        f"done: epochs={result.epochs_ran} "
        f"clean_acc={result.history['test_clean_acc'][-1]:.2f} "
        f"asr={result.history['test_asr'][-1]:.2f}"
    )
    return result


if __name__ == "__main__":
    main()
