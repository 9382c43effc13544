"""The six keyword-spotting architectures (reference utils/models.py).

All models take NCHW MFCC features (B, 1, frames, n_mfcc) — the reference's
cached-npy layout — transpose once to NHWC internally, and return raw
logits. (The reference's smallcnn/largecnn/smalllstm append log_softmax
before nn.CrossEntropyLoss — utils/models.py:63,117,176 — which is a no-op
under CE because log_softmax is idempotent; emitting logits is equivalent
and saves a kernel.)

Constructor feature sizes are per-attack (see configs.ATTACK_PRESETS,
mirroring the load_model clones at badnets.py:112-125 etc.).
"""

from __future__ import annotations

import functools as _functools

import flax.linen as nn
import jax
import jax.numpy as jnp

from audiobd_tpu.models.layers import (
    LSTM,
    TorchBatchNorm,
    TorchConv,
    TorchDense,
    avg_pool_torch,
    conv_bn_pool_block1,
    conv_bn_pool_block2,
    flatten_nhwc_as_torch,
    max_pool_torch,
    nchw_to_nhwc,
)


class SmallCNN(nn.Module):
    """3×(conv→BN→maxpool) + dropout + 2 FC (utils/models.py:17-65).

    ``fused_block1`` routes the first block through the Pallas-backward op
    (ops/fused_conv_block) — identical params/outputs, faster gradients on
    TPU. Enabled by trainer.build_attack_model on single-chip TPU."""

    num_classes: int
    linear_features: int
    dtype: object = None  # compute dtype; params stay float32
    fused_block1: bool = False
    # Fused train-mode dx contract: with fused_block1, gradients w.r.t. the
    # model INPUT in training mode are zeros unless this is set (see
    # layers.conv_bn_pool_block1). Training differentiates params only, and
    # eval-mode input grads (FlowMur) are always exact, so default off.
    fused_input_grad: bool = False
    bn_axis: str | None = None  # sync-BN mesh axis (sharded scan epochs)
    conv_impl: str = "lax"  # "im2col": blocks 2-3 as taps-matmuls (same params)
    # Pallas-backward blocks 2/3 (ops/fused_conv_block2); train-mode only,
    # measurement-gated default off (campaign block2_shootout decides).
    fused_block2: bool = False
    fused_block3: bool = False
    input_layout: str = "nchw"  # "nhwc": features arrive (B,F,M,1), no relayout

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nchw_to_nhwc(x, self.input_layout)
        x = conv_bn_pool_block1(
            self, TorchConv(64, (2, 2), dtype=self.dtype),
            TorchBatchNorm(axis_name=self.bn_axis),
            x, train, self.dtype, self.fused_block1 and self.bn_axis is None,
            input_grad=self.fused_input_grad,
        )
        x = conv_bn_pool_block2(
            self, TorchConv(64, (2, 2), dtype=self.dtype, impl=self.conv_impl),
            TorchBatchNorm(axis_name=self.bn_axis),
            x, train, self.dtype, self.fused_block2 and self.bn_axis is None,
        )
        x = conv_bn_pool_block2(
            self, TorchConv(32, (2, 2), dtype=self.dtype, impl=self.conv_impl),
            TorchBatchNorm(axis_name=self.bn_axis),
            x, train, self.dtype, self.fused_block3 and self.bn_axis is None,
            pool_padding=(0, 1),
        )
        x = nn.Dropout(0.4, deterministic=not train)(x)
        x = flatten_nhwc_as_torch(x)
        assert x.shape[-1] == self.linear_features, (
            f"smallcnn flatten {x.shape[-1]} != configured {self.linear_features}"
        )
        x = nn.relu(TorchDense(128, name="fc1", dtype=self.dtype)(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        self.sow("intermediates", "features", x)
        return TorchDense(self.num_classes, name="fc2", dtype=self.dtype)(x)


class LargeCNN(nn.Module):
    """AlexNet-style 5-conv + 3-FC (utils/models.py:68-119)."""

    num_classes: int
    linear_features: int
    dtype: object = None
    input_layout: str = "nchw"  # see SmallCNN.input_layout

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nchw_to_nhwc(x, self.input_layout)
        x = TorchConv(96, (3, 3), padding=(1, 1), dtype=self.dtype)(x)
        x = max_pool_torch(x, (2, 2))
        x = TorchConv(256, (3, 3), padding=(1, 1), dtype=self.dtype)(x)
        x = max_pool_torch(x, (2, 2))
        x = nn.relu(TorchConv(384, (3, 3), padding=(1, 1), dtype=self.dtype)(x))
        x = nn.relu(TorchConv(384, (3, 3), padding=(1, 1), dtype=self.dtype)(x))
        x = nn.relu(TorchConv(256, (3, 3), padding=(1, 1), dtype=self.dtype)(x))
        x = max_pool_torch(x, (3, 3), strides=(2, 2))
        x = flatten_nhwc_as_torch(x)
        assert x.shape[-1] == self.linear_features, (
            f"largecnn flatten {x.shape[-1]} != configured {self.linear_features}"
        )
        x = nn.relu(TorchDense(256, name="fc1", dtype=self.dtype)(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(TorchDense(128, name="fc2", dtype=self.dtype)(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        self.sow("intermediates", "features", x)
        return TorchDense(self.num_classes, name="fc3", dtype=self.dtype)(x)


class SmallLSTM(nn.Module):
    """SmallCNN conv stack → 2-layer LSTM(·→128) → FC on the final step
    (utils/models.py:121-178). ``rnn_features`` = W×C after the conv stack."""

    num_classes: int
    rnn_features: int
    dtype: object = None
    fused_block1: bool = False
    fused_input_grad: bool = False  # see SmallCNN.fused_input_grad
    bn_axis: str | None = None
    conv_impl: str = "lax"  # see SmallCNN.conv_impl
    fused_block2: bool = False  # see SmallCNN.fused_block2
    fused_block3: bool = False  # see SmallCNN.fused_block3
    input_layout: str = "nchw"  # see SmallCNN.input_layout

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nchw_to_nhwc(x, self.input_layout)
        x = conv_bn_pool_block1(
            self, TorchConv(64, (2, 2), dtype=self.dtype),
            TorchBatchNorm(axis_name=self.bn_axis),
            x, train, self.dtype, self.fused_block1 and self.bn_axis is None,
            input_grad=self.fused_input_grad,
        )
        x = conv_bn_pool_block2(
            self, TorchConv(64, (2, 2), dtype=self.dtype, impl=self.conv_impl),
            TorchBatchNorm(axis_name=self.bn_axis),
            x, train, self.dtype, self.fused_block2 and self.bn_axis is None,
        )
        x = conv_bn_pool_block2(
            self, TorchConv(32, (2, 2), dtype=self.dtype, impl=self.conv_impl),
            TorchBatchNorm(axis_name=self.bn_axis),
            x, train, self.dtype, self.fused_block3 and self.bn_axis is None,
            pool_padding=(0, 1),
        )
        x = nn.Dropout(0.4, deterministic=not train)(x)
        # NHWC (B,H,W,C) → (B, H, W*C): torch does permute(0,2,3,1).reshape,
        # i.e. (B, H, W, C) flattened over (W, C) — identical ordering.
        b, h, w, c = x.shape
        x = x.reshape(b, h, w * c)
        x = LSTM(128, num_layers=2, dtype=self.dtype)(x)
        feats = x[:, -1, :]
        self.sow("intermediates", "features", feats)
        return TorchDense(self.num_classes, name="fc2", dtype=self.dtype)(feats)


class LSTMWithAttention(nn.Module):
    """2 'same' convs → 2 biLSTM(64) → single-query soft attention over time
    (utils/models.py:180-228)."""

    num_classes: int
    time_len: int  # = n_mfcc
    seq_len: int   # = frames (100 ultra / 101 jingle / 32 daba, flowmur)
    dtype: object = None
    bn_axis: str | None = None
    input_layout: str = "nchw"  # see SmallCNN.input_layout
    # reference-faithful 0.5; the torch training-parity test sets 0.0 (dropout
    # RNG streams cannot be aligned across frameworks)
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nchw_to_nhwc(x, self.input_layout)
        x = nn.relu(TorchConv(10, (5, 1), padding="SAME", dtype=self.dtype)(x))
        x = TorchBatchNorm(axis_name=self.bn_axis)(x, train)
        x = nn.relu(TorchConv(1, (5, 1), padding="SAME", dtype=self.dtype)(x))
        x = TorchBatchNorm(axis_name=self.bn_axis)(x, train)
        x = jnp.squeeze(x, axis=-1)  # (B, seq, time_len)

        x = LSTM(64, bidirectional=True, dtype=self.dtype, name="rnn1")(x)
        x = LSTM(64, bidirectional=True, dtype=self.dtype, name="rnn2")(x)  # (B, seq, 128)

        query = nn.relu(TorchDense(128, name="dense1", dtype=self.dtype)(x[:, -1]))
        att = jax.nn.softmax(TorchDense(128, name="attention", dtype=self.dtype)(query), axis=-1)
        att_vector = jnp.einsum("bk,btk->bt", att, x)  # (B, seq)

        y = nn.relu(TorchDense(64, name="dense2", dtype=self.dtype)(att_vector))
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        y = nn.relu(TorchDense(32, name="dense3", dtype=self.dtype)(y))
        self.sow("intermediates", "features", y)
        return TorchDense(self.num_classes, name="output", dtype=self.dtype)(y)


class RNN(nn.Module):
    """3-layer LSTM(n_mfcc→768) → FC on last step (utils/models.py:231-257)."""

    num_classes: int
    time_len: int  # = n_mfcc
    dtype: object = None
    input_layout: str = "nchw"  # see SmallCNN.input_layout

    @nn.compact
    def __call__(self, x, train: bool = False):
        squeeze_axis = 1 if self.input_layout == "nchw" else -1
        x = jnp.squeeze(x, axis=squeeze_axis).astype(jnp.float32)  # (B, frames, n_mfcc)
        x = LSTM(768, num_layers=3, dtype=self.dtype)(x)
        feats = x[:, -1, :]
        self.sow("intermediates", "features", feats)
        return TorchDense(self.num_classes, name="fc", dtype=self.dtype)(feats)


class ResidualBlock(nn.Module):
    features: int
    strides: tuple[int, int] = (1, 1)
    downsample: bool = False
    dtype: object = None
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = TorchConv(self.features, (3, 3), strides=self.strides, padding=(1, 1), use_bias=False, dtype=self.dtype)(x)
        y = TorchBatchNorm(axis_name=self.bn_axis)(y, train)
        y = nn.relu(y)
        y = TorchConv(self.features, (3, 3), padding=(1, 1), use_bias=False, dtype=self.dtype)(y)
        y = TorchBatchNorm(axis_name=self.bn_axis)(y, train)
        if self.downsample:
            residual = TorchConv(
                self.features, (3, 3), strides=self.strides, padding=(1, 1), use_bias=False
            , dtype=self.dtype)(x)
            residual = TorchBatchNorm(axis_name=self.bn_axis)(residual, train)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """conv stem + 3 stages [2,2,2] of 16/32/64 ch + 1×1 stride-(2,1) conv +
    AvgPool(4) + FC (utils/models.py:261-332)."""

    num_classes: int
    linear_features: int
    layers: tuple[int, int, int] = (2, 2, 2)
    dtype: object = None
    bn_axis: str | None = None
    input_layout: str = "nchw"  # see SmallCNN.input_layout

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nchw_to_nhwc(x, self.input_layout)
        x = TorchConv(16, (3, 3), padding=(1, 1), use_bias=False, dtype=self.dtype)(x)
        x = TorchBatchNorm(axis_name=self.bn_axis)(x, train)
        x = nn.relu(x)
        for stage, (feats, stride) in enumerate(zip((16, 32, 64), ((1, 1), (2, 2), (2, 2)))):
            for block in range(self.layers[stage]):
                first = block == 0
                needs_down = first and (stride != (1, 1) or x.shape[-1] != feats)
                x = ResidualBlock(
                    feats,
                    strides=stride if first else (1, 1),
                    downsample=needs_down,
                    dtype=self.dtype,
                    bn_axis=self.bn_axis,
                    name=f"layer{stage + 1}_{block}",
                )(x, train)
        x = TorchConv(64, (1, 1), strides=(2, 1), name="conv2d", dtype=self.dtype)(x)
        x = avg_pool_torch(x, 4)
        x = flatten_nhwc_as_torch(x)
        assert x.shape[-1] == self.linear_features, (
            f"resnet flatten {x.shape[-1]} != configured {self.linear_features}"
        )
        self.sow("intermediates", "features", x)
        return TorchDense(self.num_classes, name="fc", dtype=self.dtype)(x)


MODEL_REGISTRY = {
    "smallcnn": SmallCNN,
    "largecnn": LargeCNN,
    "smalllstm": SmallLSTM,
    "lstmwithattention": LSTMWithAttention,
    "rnn": RNN,
    "resnet": ResNet,
}


def build_model(name: str, num_classes: int, feature_size: int, n_mfcc: int | None = None,
                dtype=None, fused: bool = False, fused_input_grad: bool = False,
                conv_impl: str = "lax", fused_block2: bool = False,
                fused_block3: bool = False, input_layout: str = "nchw"):
    """Instantiate a model the way the reference's load_model() clones do.

    ``feature_size`` is the attack-dependent constructor arg from
    configs.linear_features_for (flatten size, rnn features, or seq_len).
    ``fused`` enables the Pallas-backward first conv block where available;
    ``fused_input_grad`` additionally enables train-mode input gradients
    through the fused block (zeros otherwise — see SmallCNN.fused_input_grad).
    """
    name = name.lower()
    if name == "smallcnn":
        return SmallCNN(num_classes=num_classes, linear_features=feature_size,
                        dtype=dtype, fused_block1=fused, fused_input_grad=fused_input_grad,
                        conv_impl=conv_impl, fused_block2=fused_block2,
                        fused_block3=fused_block3, input_layout=input_layout)
    if name in ("largecnn", "resnet"):
        return MODEL_REGISTRY[name](num_classes=num_classes, linear_features=feature_size,
                                    dtype=dtype, input_layout=input_layout)
    if name == "smalllstm":
        return SmallLSTM(num_classes=num_classes, rnn_features=feature_size,
                         dtype=dtype, fused_block1=fused, fused_input_grad=fused_input_grad,
                         conv_impl=conv_impl, fused_block2=fused_block2,
                         fused_block3=fused_block3, input_layout=input_layout)
    if name == "lstmwithattention":
        assert n_mfcc is not None
        return LSTMWithAttention(num_classes=num_classes, time_len=n_mfcc, seq_len=feature_size,
                                 dtype=dtype, input_layout=input_layout)
    if name == "rnn":
        assert n_mfcc is not None
        return RNN(num_classes=num_classes, time_len=n_mfcc, dtype=dtype, input_layout=input_layout)
    raise ValueError(f"Unknown model {name}")


@_functools.lru_cache(maxsize=None)
def _cached_init_fn(model, train: bool):
    return jax.jit(_functools.partial(model.init, train=train))


def jit_init(model, key, sample, train: bool = False):
    """``model.init`` as ONE compiled program.

    Flax initializes eagerly op-by-op (~40 tiny programs for smallcnn:
    conv/relu/pool/rsqrt/dot/...), each a ~1 s remote compile over the axon
    tunnel on a cold cache and a host round trip warm. Modules are frozen
    dataclasses, so the jitted wrapper caches per (model, train)."""
    return _cached_init_fn(model, train)(key, jnp.asarray(sample))
