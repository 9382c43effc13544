"""Deterministic-seed exact-metric regression anchor (VERDICT r1 weak #6).

A fixed-seed BadNets run on the synthetic set must reproduce its own metrics
bit-for-bit run-to-run on the CPU backend; the recorded anchor values catch
silent drift in the DSP front-end, poisoning, init, shuffling, or the train
step. If an INTENTIONAL semantic change moves these numbers, re-record them
(python -m tests.test_regression_anchor) and justify the change in the
commit message.
"""

import numpy as np
import optax

import jax
import jax.numpy as jnp

from audiobd_tpu.configs import make_config
from audiobd_tpu.data.speech_commands import make_synthetic_clean_data
from audiobd_tpu.models import build_model
from audiobd_tpu.poison import badnets
from audiobd_tpu.train.loop import make_eval_step, make_train_step, run_eval, run_train_epoch
from audiobd_tpu.train.state import TrainState
from audiobd_tpu.utils import random as rnd

# Recorded on the CPU backend (tests force jax_platforms=cpu in conftest).
# Exact-equality anchors for integer-derived metrics; train losses get a
# tight float tolerance (reductions may be re-associated across jax/XLA
# versions, which is drift we tolerate; anything larger is a real change).
ANCHOR = {
    # Recorded with XLA_FLAGS=--xla_force_host_platform_device_count=8 (the
    # conftest environment; the flag perturbs CPU codegen at the ~1e-4 level).
    "epoch_losses": [
        2.231513579686483, 1.351035515467326, 0.9225350618362427,
        0.4879833807547887, 0.284439280629158, 0.16454618175824484,
    ],
    "clean_acc": 100.0,
    "clean_loss": 0.49788135290145874,
    "asr": 100.0,
}


def _run():
    cfg = make_config("badnets", model="smallcnn", batch_size=32)
    clean = make_synthetic_clean_data(cfg, n_per_class=10)
    poisoned = badnets.poison(cfg, clean, save=False)
    model = build_model("smallcnn", cfg.num_classes, 3072, n_mfcc=cfg.dsp.n_mfcc)
    tx = optax.adam(1e-3)
    variables = model.init(
        rnd.named_key(35, "params"), jnp.asarray(poisoned.bd_train.feats[:1]), train=False
    )
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx)
    eval_step = make_eval_step(model)
    np_rng = rnd.np_rng(35, "shuffle")
    key = rnd.named_key(35, "dropout")
    losses = []
    for _ in range(6):
        state, m = run_train_epoch(step, state, poisoned.bd_train, 32, key, np_rng)
        losses.append(m["loss"])
    clean_ev = run_eval(eval_step, state, poisoned.clean_test, 32)
    bd_ev = run_eval(eval_step, state, poisoned.bd_test, 32)
    return {
        "epoch_losses": losses,
        "clean_acc": clean_ev["acc"],
        "clean_loss": clean_ev["loss"],
        "asr": bd_ev["asr"],
    }


def test_fixed_seed_badnets_metrics_match_anchor():
    got = _run()
    np.testing.assert_allclose(got["epoch_losses"], ANCHOR["epoch_losses"], rtol=1e-4)
    np.testing.assert_allclose(got["clean_loss"], ANCHOR["clean_loss"], rtol=1e-4)
    assert got["clean_acc"] == ANCHOR["clean_acc"]
    assert got["asr"] == ANCHOR["asr"]


if __name__ == "__main__":  # re-record the anchor. Run with the conftest env:
    # XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    #   PYTHONPATH=/root/repo:/root/.axon_site python tests/test_regression_anchor.py
    jax.config.update("jax_platforms", "cpu")
    print(_run())
