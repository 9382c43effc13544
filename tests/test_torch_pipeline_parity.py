"""Full-pipeline cross-framework check: a complete BadNets attack on the
same synthetic data, trained end-to-end in torch (reference semantics:
utils/training_tools.py:52-134, badnets.py:127-175) and in this framework,
must land at the same clean-accuracy/ASR within run variance.

This is the closest achievable stand-in for a reference rerun in this image
(torchaudio/librosa/pedalboard wheels absent, Speech Commands not
downloadable — BASELINE.md protocol item 2). The poisoned arrays are byte-
identical between the two sides; only the training framework differs.
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from audiobd_tpu.configs import make_config
from audiobd_tpu.data.speech_commands import make_synthetic_clean_data
from audiobd_tpu.poison import badnets
from audiobd_tpu.train.loop import make_eval_step, make_train_step, run_eval, run_train_epoch
from audiobd_tpu.train.state import TrainState
from audiobd_tpu.utils import random as rnd
import pytest

pytestmark = pytest.mark.slow

EPOCHS = 12
LR = 1e-3
BS = 32


class TorchSmallCNN(tnn.Module):
    """The reference smallcnn (utils/models.py:17-65), linear_features=3072."""

    def __init__(self, classes=10):
        super().__init__()
        self.c1 = tnn.Conv2d(1, 64, 2)
        self.b1 = tnn.BatchNorm2d(64)
        self.c2 = tnn.Conv2d(64, 64, 2)
        self.b2 = tnn.BatchNorm2d(64)
        self.c3 = tnn.Conv2d(64, 32, 2)
        self.b3 = tnn.BatchNorm2d(32)
        self.d1 = tnn.Dropout(0.4)
        self.f1 = tnn.Linear(3072, 128)
        self.d2 = tnn.Dropout(0.5)
        self.f2 = tnn.Linear(128, classes)

    def forward(self, x):
        x = tF.max_pool2d(self.b1(tF.relu(self.c1(x))), (1, 3))
        x = tF.max_pool2d(self.b2(tF.relu(self.c2(x))), (2, 2), padding=(1, 1))
        x = tF.max_pool2d(self.b3(tF.relu(self.c3(x))), (2, 2), padding=(0, 1))
        x = self.d1(x).flatten(1)
        x = self.d2(tF.relu(self.f1(x)))
        return tF.log_softmax(self.f2(x), dim=1)


def _train_torch(poisoned):
    torch.manual_seed(35)
    model = TorchSmallCNN()
    opt = torch.optim.Adam(model.parameters(), lr=LR)
    crit = tnn.CrossEntropyLoss()  # on log-softmax outputs — the reference's quirk
    x = torch.from_numpy(np.asarray(poisoned.bd_train.feats, np.float32))
    y = torch.from_numpy(poisoned.bd_train.labels)
    g = torch.Generator().manual_seed(35)
    model.train()
    for _ in range(EPOCHS):
        for idx in torch.randperm(len(x), generator=g).split(BS):
            opt.zero_grad()
            loss = crit(model(x[idx]), y[idx])
            loss.backward()
            opt.step()
    model.eval()
    with torch.no_grad():
        clean_pred = model(torch.from_numpy(poisoned.clean_test.feats.astype(np.float32))).argmax(1)
        clean_acc = 100.0 * (clean_pred.numpy() == poisoned.clean_test.labels).mean()
        bd_pred = model(torch.from_numpy(np.asarray(poisoned.bd_test.feats, np.float32))).argmax(1)
        ind = poisoned.bd_test.indicators == 1
        asr = 100.0 * (bd_pred.numpy()[ind] == poisoned.bd_test.labels[ind]).mean()
    return clean_acc, asr


def _train_jax(model, poisoned):
    import optax

    tx = optax.adam(LR)
    variables = model.init(
        rnd.named_key(35, "params"), jnp.asarray(poisoned.bd_train.feats[:1]), train=False
    )
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx)
    eval_step = make_eval_step(model)
    np_rng = rnd.np_rng(35, "shuffle")
    key = rnd.named_key(35, "dropout")
    for _ in range(EPOCHS):
        state, _ = run_train_epoch(step, state, poisoned.bd_train, BS, key, np_rng)
    clean = run_eval(eval_step, state, poisoned.clean_test, BS)
    bd = run_eval(eval_step, state, poisoned.bd_test, BS)
    return clean["acc"], bd["asr"]


def test_badnets_attack_metrics_match_torch_end_to_end():
    cfg = make_config("badnets", model="smallcnn", batch_size=BS)
    clean = make_synthetic_clean_data(cfg, n_per_class=30)
    poisoned = badnets.poison(cfg, clean, save=False)

    from audiobd_tpu.models import build_model

    model = build_model("smallcnn", cfg.num_classes, 3072, n_mfcc=cfg.dsp.n_mfcc)
    jax_acc, jax_asr = _train_jax(model, poisoned)
    torch_acc, torch_asr = _train_torch(poisoned)

    # Both frameworks must drive the attack home on this separable set...
    assert jax_acc > 80 and torch_acc > 80, (jax_acc, torch_acc)
    assert jax_asr > 85 and torch_asr > 85, (jax_asr, torch_asr)
    # ...and agree within run variance.
    assert abs(jax_acc - torch_acc) <= 10.0, (jax_acc, torch_acc)
    assert abs(jax_asr - torch_asr) <= 10.0, (jax_asr, torch_asr)
