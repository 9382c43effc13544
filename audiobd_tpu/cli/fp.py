"""Fine-Pruning defense entry point (reference fp.py CLI surface)."""

from __future__ import annotations

import argparse

from audiobd_tpu.configs import make_config
from audiobd_tpu.utils.compile_cache import enable_compilation_cache
from audiobd_tpu.cli.common import infer_attack
from audiobd_tpu.defend import fp



def add_arguments():
    parser = argparse.ArgumentParser(description="Fine-Pruning defense (TPU)")
    parser.add_argument("--attack", type=str, default="badnets",
                        help="attack preset the checkpoint was produced by")
    parser.add_argument("--dataset", type=str, default="SCDv1-10")
    parser.add_argument("--result", type=str, default="badnets_smallcnn")
    parser.add_argument("--model", type=str, default=None)
    parser.add_argument("--val_ratio", type=float, default=0.05)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--lr_ft", type=float, default=0.01)
    parser.add_argument("--acc_ratio", type=float, default=0.1)
    parser.add_argument("--once_prune_ratio", type=float, default=0.01)
    return parser.parse_args()


def main():
    args = add_arguments()
    attack, spec_model = infer_attack(args.result, args.attack)
    cfg = make_config(attack, dataset=args.dataset, result=args.result,
                      model=args.model or spec_model, batch_size=args.batch_size)
    enable_compilation_cache(cfg.train.compilation_cache)
    result = fp.mitigation(
        cfg,
        val_ratio=args.val_ratio,
        acc_ratio=args.acc_ratio,
        once_prune_ratio=args.once_prune_ratio,
        lr_ft=args.lr_ft,
    )
    print(f"fp done: pruned={result.pruned_channels} acc={result.test_acc:.2f} asr={result.test_asr:.2f}")
    return result


if __name__ == "__main__":
    main()
