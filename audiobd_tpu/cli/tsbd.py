"""TSBD defense entry point (reference tsbd.py CLI surface)."""

from __future__ import annotations

import argparse

from audiobd_tpu.configs import make_config
from audiobd_tpu.utils.compile_cache import enable_compilation_cache
from audiobd_tpu.cli.common import infer_attack
from audiobd_tpu.defend import tsbd



def add_arguments():
    parser = argparse.ArgumentParser(description="TSBD defense (TPU)")
    parser.add_argument("--attack", type=str, default="badnets")
    parser.add_argument("--dataset", type=str, default="SCDv1-10")
    parser.add_argument("--result", type=str, default="badnets_smallcnn")
    parser.add_argument("--model", type=str, default=None)
    parser.add_argument("--only_finetune", type=lambda s: s.lower() != "false", default=True)
    parser.add_argument("--data_type", choices=["clean_test", "poison_test", "clean_val"],
                        default="clean_val")
    parser.add_argument("--record_layer", type=str, default=None)
    parser.add_argument("--val_ratio", type=float, default=0.05)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--lr_un", type=float, default=1e-4)
    parser.add_argument("--unlearn_epochs", type=int, default=1000)
    parser.add_argument("--reinit_weight_ratio", type=float, default=0.7)
    parser.add_argument("--lr_ft", type=float, default=0.01)
    parser.add_argument("--ft_epochs", type=int, default=51)
    parser.add_argument(
        "--vectorized_ft", type=lambda s: s.lower() != "false", default=True,
        help="stage D as one vmapped program (default); false = per-ratio host loop",
    )
    return parser.parse_args()


def main():
    args = add_arguments()
    attack, spec_model = infer_attack(args.result, args.attack)
    cfg = make_config(attack, dataset=args.dataset, result=args.result,
                      model=args.model or spec_model, batch_size=args.batch_size)
    enable_compilation_cache(cfg.train.compilation_cache)
    result = tsbd.mitigation(
        cfg,
        only_finetune=args.only_finetune,
        data_type=args.data_type,
        val_ratio=args.val_ratio,
        lr_un=args.lr_un,
        unlearn_epochs=args.unlearn_epochs,
        reinit_weight_ratio=args.reinit_weight_ratio,
        lr_ft=args.lr_ft,
        ft_epochs=args.ft_epochs,
        record_layer=args.record_layer,
        vectorized_ft=args.vectorized_ft,
    )
    print(f"tsbd done ({result.stage}): acc={result.test_acc:.2f} asr={result.test_asr:.2f}")
    return result


if __name__ == "__main__":
    main()
