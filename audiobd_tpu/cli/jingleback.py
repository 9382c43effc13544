"""JingleBack attack entry point (reference jingleback.py CLI surface)."""

from __future__ import annotations

import argparse

from audiobd_tpu.configs import add_common_args, config_from_args
from audiobd_tpu.utils.compile_cache import enable_compilation_cache
from audiobd_tpu.data.speech_commands import (
    load_clean_data,
    make_synthetic_clean_data,
    save_clean_data,
)
from audiobd_tpu.poison import jingleback
from audiobd_tpu.train.trainer import train_attack


def parse_arguments():
    parser = argparse.ArgumentParser(description="JingleBack audio backdoor attack (TPU)")
    add_common_args(parser)
    parser.add_argument("--style", type=int, default=None, choices=range(6), help="style chain 0-5")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--synthetic_per_class", type=int, default=50)
    return parser.parse_args()


def main():
    args = parse_arguments()
    cfg = config_from_args("jingleback", args, style=args.style)
    enable_compilation_cache(cfg.train.compilation_cache)
    print("----------JingleBack attack (audiobd_tpu)----------")
    for key, value in vars(args).items():
        print(f"{key}: {value}")
    if args.synthetic:
        clean = make_synthetic_clean_data(cfg, n_per_class=args.synthetic_per_class)
        save_clean_data(cfg, clean)  # defenses read the clean npy cache
    else:
        clean = load_clean_data(cfg)
    poisoned = jingleback.poison(cfg, clean)
    result = train_attack(cfg, poisoned.bd_train, poisoned.clean_test, poisoned.bd_test)
    print(
        f"done: epochs={result.epochs_ran} "
        f"clean_acc={result.history['test_clean_acc'][-1]:.2f} "
        f"asr={result.history['test_asr'][-1]:.2f}"
    )
    return result


if __name__ == "__main__":
    main()
