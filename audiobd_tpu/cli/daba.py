"""DABA attack entry point (reference daba.py CLI surface)."""

from __future__ import annotations

import argparse

from audiobd_tpu.configs import add_common_args, config_from_args
from audiobd_tpu.utils.compile_cache import enable_compilation_cache
from audiobd_tpu.data.speech_commands import (
    load_clean_data,
    make_synthetic_clean_data,
    save_clean_data,
)
from audiobd_tpu.poison import daba
from audiobd_tpu.train.trainer import train_attack


def parse_arguments():
    parser = argparse.ArgumentParser(description="DABA audio backdoor attack (TPU)")
    add_common_args(parser)
    parser.add_argument("--trigger_selection_mode", type=str, default=None, choices=["Cer", "Cer&Inf"])
    parser.add_argument("--variant", type=lambda s: s.lower() != "false", default=None)
    parser.add_argument("--po_db", type=float, default=None)
    parser.add_argument("--export_wav_tree", action="store_true",
                        help="also write the reference-style poisoned wav trees")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--synthetic_per_class", type=int, default=50)
    return parser.parse_args()


def main():
    args = parse_arguments()
    cfg = config_from_args(
        "daba", args,
        trigger_selection_mode=args.trigger_selection_mode,
        variant=args.variant,
        po_db=args.po_db,
    )
    enable_compilation_cache(cfg.train.compilation_cache)
    print("----------DABA attack (audiobd_tpu)----------")
    for key, value in vars(args).items():
        print(f"{key}: {value}")
    if args.synthetic:
        clean = make_synthetic_clean_data(cfg, n_per_class=args.synthetic_per_class)
        save_clean_data(cfg, clean)  # defenses read the clean npy cache
    else:
        clean = load_clean_data(cfg)
    poisoned = daba.poison(cfg, clean, export_wav_tree=args.export_wav_tree)
    print(f"selected trigger #{poisoned.trigger_index}; "
          f"{int(poisoned.bd_train.indicators.sum())} hosts poisoned")
    result = train_attack(cfg, poisoned.bd_train, poisoned.clean_test, poisoned.bd_test)
    print(
        f"done: epochs={result.epochs_ran} "
        f"clean_acc={result.history['test_clean_acc'][-1]:.2f} "
        f"asr={result.history['test_asr'][-1]:.2f}"
    )
    return result


if __name__ == "__main__":
    main()
