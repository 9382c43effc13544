"""FT-reg defense entry point (reference ft_reg.py CLI surface)."""

from __future__ import annotations

import argparse

from audiobd_tpu.configs import make_config
from audiobd_tpu.utils.compile_cache import enable_compilation_cache
from audiobd_tpu.cli.common import infer_attack
from audiobd_tpu.defend import ft_reg



def add_arguments():
    parser = argparse.ArgumentParser(description="FT-reg defense (TPU)")
    parser.add_argument("--attack", type=str, default="badnets")
    parser.add_argument("--dataset", type=str, default="SCDv1-10")
    parser.add_argument("--result", type=str, default="badnets_smallcnn")
    parser.add_argument("--model", type=str, default=None)
    parser.add_argument("--val_ratio", type=float, default=0.05)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--lr_ft", type=float, default=0.001)
    parser.add_argument("--ft_epochs", type=int, default=300,
                        help="reg fine-tune epochs (reference hardcodes 300, ft_reg.py:263)")
    parser.add_argument("--r", type=float, default=0.05)
    parser.add_argument("--alpha", type=float, default=0.7)
    return parser.parse_args()


def main():
    args = add_arguments()
    attack, spec_model = infer_attack(args.result, args.attack)
    cfg = make_config(attack, dataset=args.dataset, result=args.result,
                      model=args.model or spec_model, batch_size=args.batch_size)
    enable_compilation_cache(cfg.train.compilation_cache)
    result = ft_reg.mitigation(
        cfg,
        val_ratio=args.val_ratio,
        lr_ft=args.lr_ft,
        reg_epochs=args.ft_epochs,
        r=args.r,
        alpha=args.alpha,
    )
    for ratio, acc, asr in result.per_ratio:
        print(f"ratio {ratio}: acc={acc:.2f} asr={asr:.2f}")
    return result


if __name__ == "__main__":
    main()
