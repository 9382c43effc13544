from audiobd_tpu.train.loop import (
    ArraySet,
    EarlyStopping,
    make_eval_step,
    make_train_step,
    run_eval,
    run_train_epoch,
)
from audiobd_tpu.train.state import TrainState
from audiobd_tpu.train.trainer import (
    TrainResult,
    build_attack_model,
    make_optimizer,
    train_attack,
    train_clean,
)

__all__ = [
    "ArraySet",
    "EarlyStopping",
    "TrainState",
    "TrainResult",
    "make_train_step",
    "make_eval_step",
    "run_train_epoch",
    "run_eval",
    "train_attack",
    "train_clean",
    "build_attack_model",
    "make_optimizer",
]
