"""Unlearning correlation analysis entry point (reference
correlation_analysis.py CLI surface)."""

from __future__ import annotations

import argparse

from audiobd_tpu.configs import make_config
from audiobd_tpu.utils.compile_cache import enable_compilation_cache
from audiobd_tpu.cli.common import infer_attack
from audiobd_tpu.defend import correlation



def add_arguments():
    parser = argparse.ArgumentParser(description="Unlearning NWC correlation analysis (TPU)")
    parser.add_argument("--attack", type=str, default="badnets")
    parser.add_argument("--dataset", type=str, default="SCDv1-10")
    parser.add_argument("--result", type=str, default="badnets_smallcnn")
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--lr_un", type=float, default=1e-4)
    parser.add_argument("--unlearn_epochs", type=int, default=10)
    parser.add_argument("--subset", type=int, default=None)
    return parser.parse_args()


def main():
    args = add_arguments()
    attack, model = infer_attack(args.result, args.attack)
    cfg = make_config(attack, dataset=args.dataset, result=args.result,
                      model=model, batch_size=args.batch_size)
    enable_compilation_cache(cfg.train.compilation_cache)
    result = correlation.analyze(
        cfg, lr_un=args.lr_un, unlearn_epochs=args.unlearn_epochs, subset=args.subset
    )
    print(f"pearson r = {result.pearson_r:.4f}")
    return result


if __name__ == "__main__":
    main()
