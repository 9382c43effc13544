"""BadNets attack entry point.

Usage mirrors the reference script (badnets.py:17-36):
    python -m audiobd_tpu.cli.badnets --model smallcnn --dataset SCDv1-10 ...
plus `--config configs/badnets.yaml` (YAML actually loaded; CLI overrides).
"""

from __future__ import annotations

import argparse

from audiobd_tpu.configs import add_common_args, config_from_args
from audiobd_tpu.utils.compile_cache import enable_compilation_cache
from audiobd_tpu.data.speech_commands import (
    load_clean_data,
    make_synthetic_clean_data,
    save_clean_data,
)
from audiobd_tpu.poison import badnets
from audiobd_tpu.train.trainer import train_attack


def parse_arguments():
    parser = argparse.ArgumentParser(description="BadNets audio backdoor attack (TPU)")
    add_common_args(parser)
    parser.add_argument("--trigger_size", type=int, default=None, help="square trigger side")
    parser.add_argument(
        "--synthetic", action="store_true",
        help="use the deterministic synthetic dataset (no Speech Commands on disk)",
    )
    parser.add_argument("--synthetic_per_class", type=int, default=50)
    parser.add_argument("--profile_dir", type=str, default=None, help="write a jax.profiler device trace here")
    parser.add_argument("--resume", action="store_true", help="resume from record/<result>/checkpoint")
    return parser.parse_args()


def main():
    args = parse_arguments()
    cfg = config_from_args("badnets", args, trigger_size=args.trigger_size)
    enable_compilation_cache(cfg.train.compilation_cache)
    print("----------BadNets attack (audiobd_tpu)----------")
    for key, value in vars(args).items():
        print(f"{key}: {value}")

    if args.synthetic:
        clean = make_synthetic_clean_data(cfg, n_per_class=args.synthetic_per_class)
        save_clean_data(cfg, clean)  # defenses read the clean npy cache
    else:
        clean = load_clean_data(cfg)
    poisoned = badnets.poison(cfg, clean)
    result = train_attack(cfg, poisoned.bd_train, poisoned.clean_test, poisoned.bd_test,
                          profile_dir=args.profile_dir, resume=args.resume)
    print(
        f"done: epochs={result.epochs_ran} "
        f"clean_acc={result.history['test_clean_acc'][-1]:.2f} "
        f"asr={result.history['test_asr'][-1]:.2f} "
        f"throughput={result.clips_per_sec:.1f} clips/s"
    )
    return result


if __name__ == "__main__":
    main()
