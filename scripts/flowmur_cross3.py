"""FlowMur final attribution: victim INIT vs shuffle/dropout stream.

flowmur_cross2_r5.jsonl pinned the seed-bimodal failure on the victim's
training stream (train_seed column-dominant; poison selection irrelevant).
That stream has three named sub-streams (utils/random.py): "params" (model
init), "shuffle" (epoch permutations), "dropout". This splits them by
redirecting the named streams per-run (monkeypatched rnd.named_key/np_rng —
test instrumentation only, production derivation untouched): trigger and
poison fixed to seed 35, then (init_seed, other_seed) crossed over
{35, 36, 39}^2's informative off-diagonal.

Run on the TPU fixture:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/flowmur_cross3.py
Output: flowmur_cross3_r5.jsonl (resumable).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _flowmur_common as common  # noqa: E402  (fixture preamble side effects)

import numpy as np  # noqa: E402

import audiobd_tpu.utils.random as rnd  # noqa: E402
from audiobd_tpu.configs import make_config  # noqa: E402
from audiobd_tpu.data.speech_commands import make_synthetic_clean_data  # noqa: E402
from audiobd_tpu.poison import flowmur  # noqa: E402
from audiobd_tpu.train.trainer import train_attack  # noqa: E402

COMBOS = [  # (init_seed, other_seed) — "other" covers shuffle + dropout
    (35, 36), (36, 35), (35, 39), (39, 35), (36, 36), (39, 39),
]
EPOCHS = int(os.environ.get("CROSS3_EPOCHS", "120"))
OUT = os.environ.get("CROSS3_OUT", common.repo_path("flowmur_cross3_r5.jsonl"))

_ORIG_NAMED, _ORIG_NP = rnd.named_key, rnd.np_rng


def _patch(init_seed: int, other_seed: int):
    def named_key(seed, name):
        return _ORIG_NAMED(init_seed if name == "params" else other_seed, name)

    def np_rng(seed=35, name="data"):
        return _ORIG_NP(other_seed, name)

    rnd.named_key, rnd.np_rng = named_key, np_rng


def _unpatch():
    rnd.named_key, rnd.np_rng = _ORIG_NAMED, _ORIG_NP


def main():
    done = common.done_rows(OUT, ("init_seed", "other_seed"))
    trigger = np.load(common.repo_path("record", "flowmur_diag_35", "trigger.npy"))
    cfg = make_config("flowmur", seed=35)
    clean = make_synthetic_clean_data(cfg, n_per_class=500)
    poisoned = flowmur.poison(cfg, clean, trigger, save=False)  # poison stream: seed 35
    for init_seed, other_seed in COMBOS:
        if (init_seed, other_seed) in done:
            continue
        cfg_t = make_config(
            "flowmur", seed=35, fused_conv_block="off",
            result=f"flowmur_cross3_{init_seed}_{other_seed}",
            num_epochs=EPOCHS, patience=10**6,
        )
        _patch(init_seed, other_seed)
        try:
            t0 = time.time()
            res = train_attack(
                cfg_t, poisoned.bd_train, poisoned.clean_test, poisoned.bd_test,
                verbose=False, save=False,
            )
        finally:
            _unpatch()
        asr = res.history["test_asr"]
        row = {
            "init_seed": init_seed,
            "other_seed": other_seed,
            "asr_final": round(asr[-1], 2),
            "asr_peak": round(max(asr), 2),
            "asr_peak_epoch": int(np.argmax(asr)) + 1,
            "clean_acc_final": round(res.history["test_clean_acc"][-1], 2),
            "wall_sec": round(time.time() - t0, 1),
        }
        common.append_row(OUT, row)


if __name__ == "__main__":
    main()
