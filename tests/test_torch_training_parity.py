"""Cross-framework training parity.

Train the same ResNet (the reference's architecture, utils/models.py:261-332)
in torch and in this framework from IDENTICAL weights on IDENTICAL batches
with the same Adam hyperparameters, and require the per-step training losses
to track each other. This pins down conv/BN/pool semantics, initialization
transfer, CE-loss equivalence and the optimizer in one shot.

ResNet is used because it has BatchNorm but no dropout (dropout RNG streams
cannot be aligned across frameworks).
"""

import numpy as np
import optax
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from audiobd_tpu.models import build_model
from audiobd_tpu.train.loop import make_train_step
from audiobd_tpu.train.state import TrainState

pytestmark = pytest.mark.slow


# -- reference-architecture ResNet in torch (test fixture) -------------------


class TorchResBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1, downsample=False):
        super().__init__()
        self.c1 = tnn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)
        self.b1 = tnn.BatchNorm2d(cout)
        self.c2 = tnn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.b2 = tnn.BatchNorm2d(cout)
        self.down = (
            tnn.Sequential(
                tnn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False),
                tnn.BatchNorm2d(cout),
            )
            if downsample
            else None
        )

    def forward(self, x):
        res = self.down(x) if self.down is not None else x
        y = tF.relu(self.b1(self.c1(x)))
        y = self.b2(self.c2(y))
        return tF.relu(y + res)


class TorchResNet(tnn.Module):
    def __init__(self, classes=10, linear_features=128):
        super().__init__()
        self.conv = tnn.Conv2d(1, 16, 3, padding=1, bias=False)
        self.bn = tnn.BatchNorm2d(16)
        self.layer1 = tnn.Sequential(TorchResBlock(16, 16), TorchResBlock(16, 16))
        self.layer2 = tnn.Sequential(TorchResBlock(16, 32, 2, True), TorchResBlock(32, 32))
        self.layer3 = tnn.Sequential(TorchResBlock(32, 64, 2, True), TorchResBlock(64, 64))
        self.conv2d = tnn.Conv2d(64, 64, 1, stride=(2, 1))
        self.fc = tnn.Linear(linear_features, classes)

    def forward(self, x):
        x = tF.relu(self.bn(self.conv(x)))
        x = self.layer3(self.layer2(self.layer1(x)))
        x = self.conv2d(x)
        x = tF.avg_pool2d(x, 4)
        return self.fc(x.flatten(1))


# -- weight transfer flax → torch --------------------------------------------


def _t(x):
    return torch.from_numpy(np.asarray(x))


def copy_conv(tconv, fparams):
    with torch.no_grad():
        tconv.weight.copy_(_t(fparams["kernel"]).permute(3, 2, 0, 1))
        if tconv.bias is not None:
            tconv.bias.copy_(_t(fparams["bias"]))


def copy_bn(tbn, fparams, fstats):
    with torch.no_grad():
        tbn.weight.copy_(_t(fparams["scale"]))
        tbn.bias.copy_(_t(fparams["bias"]))
        tbn.running_mean.copy_(_t(fstats["mean"]))
        tbn.running_var.copy_(_t(fstats["var"]))


def copy_block(tblock, p, s, name):
    copy_conv(tblock.c1, p[name]["TorchConv_0"]["Conv_0"])
    copy_bn(tblock.b1, p[name]["TorchBatchNorm_0"]["BatchNorm_0"], s[name]["TorchBatchNorm_0"]["BatchNorm_0"])
    copy_conv(tblock.c2, p[name]["TorchConv_1"]["Conv_0"])
    copy_bn(tblock.b2, p[name]["TorchBatchNorm_1"]["BatchNorm_0"], s[name]["TorchBatchNorm_1"]["BatchNorm_0"])
    if tblock.down is not None:
        copy_conv(tblock.down[0], p[name]["TorchConv_2"]["Conv_0"])
        copy_bn(tblock.down[1], p[name]["TorchBatchNorm_2"]["BatchNorm_0"], s[name]["TorchBatchNorm_2"]["BatchNorm_0"])


def test_resnet_training_losses_track_torch():
    rng = np.random.default_rng(11)
    n, frames, n_mfcc = 64, 32, 40
    feats = rng.standard_normal((n, 1, frames, n_mfcc)).astype(np.float32)
    labels = rng.integers(0, 10, n).astype(np.int64)

    model = build_model("resnet", 10, 128, n_mfcc=n_mfcc)
    variables = model.init(jax.random.PRNGKey(3), jnp.asarray(feats[:2]), train=False)
    p = variables["params"]
    s = variables["batch_stats"]

    tm = TorchResNet()
    copy_conv(tm.conv, p["TorchConv_0"]["Conv_0"])
    copy_bn(tm.bn, p["TorchBatchNorm_0"]["BatchNorm_0"], s["TorchBatchNorm_0"]["BatchNorm_0"])
    for stage in (1, 2, 3):
        tseq = getattr(tm, f"layer{stage}")
        for block in (0, 1):
            copy_block(tseq[block], p, s, f"layer{stage}_{block}")
    copy_conv(tm.conv2d, p["conv2d"]["Conv_0"])
    with torch.no_grad():
        tm.fc.weight.copy_(_t(p["fc"]["Dense_0"]["kernel"]).T)
        tm.fc.bias.copy_(_t(p["fc"]["Dense_0"]["bias"]))

    lr = 1e-3
    tx = optax.adam(lr)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx)

    topt = torch.optim.Adam(tm.parameters(), lr=lr)
    tcrit = tnn.CrossEntropyLoss()
    tm.train()

    jax_losses, torch_losses = [], []
    bs = 16
    for i in range(4):
        sl = slice(i * bs, (i + 1) * bs)
        batch = {
            "x": jnp.asarray(feats[sl]),
            "y": jnp.asarray(labels[sl].astype(np.int32)),
            "indicator": jnp.zeros(bs, jnp.int32),
            "mask": jnp.ones(bs, bool),
        }
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        jax_losses.append(float(metrics["loss_batchmean"]))

        topt.zero_grad()
        out = tm(torch.from_numpy(feats[sl]))
        loss = tcrit(out, torch.from_numpy(labels[sl]))
        loss.backward()
        topt.step()
        torch_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3, atol=2e-3)


# -- lstmwithattention (VERDICT r4 item 3: separate "architecture-limited"
# -- from "training dynamics diverge") ---------------------------------------


class TorchLSTMAtt(tnn.Module):
    """Faithful torch lstmwithattention (reference utils/models.py:180-228)
    with dropout p=0 (dropout RNG streams cannot be aligned; the flax side
    builds with dropout_rate=0.0)."""

    def __init__(self, classes=10, time_len=40, seq_len=32):
        super().__init__()
        self.conv1 = tnn.Conv2d(1, 10, (5, 1), padding="same")
        self.batchnorm1 = tnn.BatchNorm2d(10)
        self.conv2 = tnn.Conv2d(10, 1, (5, 1), padding="same")
        self.batchnorm2 = tnn.BatchNorm2d(1)
        self.rnn1 = tnn.LSTM(input_size=time_len, hidden_size=64, bidirectional=True, batch_first=True)
        self.rnn2 = tnn.LSTM(input_size=128, hidden_size=64, bidirectional=True, batch_first=True)
        self.dense1 = tnn.Linear(128, 128)
        self.attention = tnn.Linear(128, 128)
        self.dense2 = tnn.Linear(seq_len, 64)
        self.dense3 = tnn.Linear(64, 32)
        self.output = tnn.Linear(32, classes)

    def forward(self, x):
        x = self.batchnorm1(torch.relu(self.conv1(x)))
        x = self.batchnorm2(torch.relu(self.conv2(x)))
        x = x.squeeze(1)
        x, _ = self.rnn1(x)
        x, _ = self.rnn2(x)
        query = torch.relu(self.dense1(x[:, -1]))
        att = tF.softmax(self.attention(query), dim=1)
        att_vector = torch.einsum("ik,ijk->ij", att, x)
        x = torch.relu(self.dense2(att_vector))
        x = torch.relu(self.dense3(x))
        return self.output(x)


def copy_lstm(trnn, fparams):
    """flax LSTMLayer {w_ih (F,4H), w_hh (H,4H), b_ih, b_hh} (torch gate
    order i,f,g,o) → torch nn.LSTM l0 (+_reverse for the bwd direction)."""
    with torch.no_grad():
        trnn.weight_ih_l0.copy_(_t(fparams["l0_fwd"]["w_ih"]).T)
        trnn.weight_hh_l0.copy_(_t(fparams["l0_fwd"]["w_hh"]).T)
        trnn.bias_ih_l0.copy_(_t(fparams["l0_fwd"]["b_ih"]))
        trnn.bias_hh_l0.copy_(_t(fparams["l0_fwd"]["b_hh"]))
        trnn.weight_ih_l0_reverse.copy_(_t(fparams["l0_bwd"]["w_ih"]).T)
        trnn.weight_hh_l0_reverse.copy_(_t(fparams["l0_bwd"]["w_hh"]).T)
        trnn.bias_ih_l0_reverse.copy_(_t(fparams["l0_bwd"]["b_ih"]))
        trnn.bias_hh_l0_reverse.copy_(_t(fparams["l0_bwd"]["b_hh"]))


def copy_dense(tdense, fparams):
    with torch.no_grad():
        tdense.weight.copy_(_t(fparams["Dense_0"]["kernel"]).T)
        tdense.bias.copy_(_t(fparams["Dense_0"]["bias"]))


def test_lstmwithattention_training_losses_track_torch():
    rng = np.random.default_rng(13)
    n, frames, n_mfcc = 96, 32, 40
    feats = rng.standard_normal((n, 1, frames, n_mfcc)).astype(np.float32)
    labels = rng.integers(0, 10, n).astype(np.int64)

    from audiobd_tpu.models.zoo import LSTMWithAttention

    model = LSTMWithAttention(num_classes=10, time_len=n_mfcc, seq_len=frames, dropout_rate=0.0)
    variables = model.init(jax.random.PRNGKey(5), jnp.asarray(feats[:2]), train=False)
    p = variables["params"]
    s = variables["batch_stats"]

    tm = TorchLSTMAtt()
    copy_conv(tm.conv1, p["TorchConv_0"]["Conv_0"])
    copy_bn(tm.batchnorm1, p["TorchBatchNorm_0"]["BatchNorm_0"], s["TorchBatchNorm_0"]["BatchNorm_0"])
    copy_conv(tm.conv2, p["TorchConv_1"]["Conv_0"])
    copy_bn(tm.batchnorm2, p["TorchBatchNorm_1"]["BatchNorm_0"], s["TorchBatchNorm_1"]["BatchNorm_0"])
    copy_lstm(tm.rnn1, p["rnn1"])
    copy_lstm(tm.rnn2, p["rnn2"])
    for name in ("dense1", "attention", "dense2", "dense3", "output"):
        copy_dense(getattr(tm, name), p[name])

    lr = 1e-3
    tx = optax.adam(lr)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx)

    topt = torch.optim.Adam(tm.parameters(), lr=lr)
    tcrit = tnn.CrossEntropyLoss()
    tm.train()

    jax_losses, torch_losses = [], []
    bs = 16
    for i in range(6):
        sl = slice(i * bs, (i + 1) * bs)
        batch = {
            "x": jnp.asarray(feats[sl]),
            "y": jnp.asarray(labels[sl].astype(np.int32)),
            "indicator": jnp.zeros(bs, jnp.int32),
            "mask": jnp.ones(bs, bool),
        }
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        jax_losses.append(float(metrics["loss_batchmean"]))

        topt.zero_grad()
        out = tm(torch.from_numpy(feats[sl]))
        loss = tcrit(out, torch.from_numpy(labels[sl]))
        loss.backward()
        topt.step()
        torch_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3, atol=2e-3)
