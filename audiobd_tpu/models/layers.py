"""Building blocks with PyTorch-compatible shape/init semantics.

The reference's six architectures (utils/models.py) are defined in torch
NCHW with floor-mode pooling, implicit -inf pool padding, BatchNorm2d
(eps 1e-5, momentum 0.1) and U(-1/sqrt(fan_in)) init. The blocks here
reproduce those *semantics* on top of flax.linen, while computing in NHWC —
the layout XLA:TPU tiles convolutions for.

LSTMs are expressed TPU-first: the input projection of the whole sequence is
one large matmul outside the scan; the scan body carries only the (h, c)
recurrence with a single fused gate matmul per step.
"""

from __future__ import annotations



import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def torch_uniform_init(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch Linear/Conv default."""
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_uniform_init():
    """torch kaiming_uniform_(a=sqrt(5)) for weights: U(-sqrt(6/((1+5)fan_in)))."""

    def init(key, shape, dtype=jnp.float32):
        # flax kernel shape: (..., fan_in, fan_out) for Dense; (kh, kw, in, out) for Conv.
        if len(shape) == 2:
            fan_in = shape[0]
        else:
            receptive = int(np.prod(shape[:-2]))
            fan_in = shape[-2] * receptive
        bound = np.sqrt(6.0 / (6.0 * fan_in)) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchDense(nn.Module):
    """nn.Linear with torch default init."""

    features: int
    dtype: object = None  # compute dtype (params stay float32)

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            kernel_init=kaiming_uniform_init(),
            bias_init=torch_uniform_init(fan_in),
            dtype=self.dtype,
        )(x)


class _TapConv(nn.Module):
    """Stride-1 conv as an im2col taps-matmul: taps concat along channels →
    one (B·H'·W', kh·kw·Cin) @ (kh·kw·Cin, F) dot. Identical param tree and
    init to nn.Conv (kernel (kh, kw, Cin, F) + bias), so checkpoints
    interoperate; kernel.reshape row order (i·kw+j)·Cin+c matches the tap
    concat order. MXU-shaped alternative lowering for the tiny spatial
    extents of the KWS models (scripts/block2_experiments.py measures it)."""

    features: int
    kernel_size: tuple[int, int]
    padding: tuple[int, int] = (0, 0)
    use_bias: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        fan_in = in_ch * kh * kw
        kernel = self.param("kernel", kaiming_uniform_init(), (kh, kw, in_ch, self.features))
        bias = (
            self.param("bias", torch_uniform_init(fan_in), (self.features,))
            if self.use_bias else None
        )
        dt = self.dtype or x.dtype
        x = x.astype(dt)
        ph, pw = self.padding
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
        h, w = x.shape[1], x.shape[2]
        taps = jnp.concatenate(
            [x[:, i : i + h - kh + 1, j : j + w - kw + 1]
             for i in range(kh) for j in range(kw)],
            axis=-1,
        )
        out = jax.lax.dot_general(
            taps, kernel.reshape(kh * kw * in_ch, self.features).astype(dt),
            (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(dt)
        return out + bias.astype(dt) if bias is not None else out


class TorchConv(nn.Module):
    """nn.Conv2d on NHWC with torch default init and torch padding ints.

    ``impl="im2col"`` swaps the stride-1 lax.conv lowering for the taps
    matmul (_TapConv) under the SAME submodule name/params. Measured dead
    end on v5e (round-4 block2_shootout): im2col 57.2k clips/s vs lax
    70.9k on the full smallcnn bf16 epoch — keep ``impl="lax"`` default."""

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: tuple[int, int] | str = (0, 0)
    use_bias: bool = True
    dtype: object = None  # compute dtype (params stay float32)
    impl: str = "lax"

    @nn.compact
    def __call__(self, x):
        if self.impl == "im2col":
            assert self.strides == (1, 1) and not isinstance(self.padding, str)
            return _TapConv(
                self.features, self.kernel_size, padding=self.padding,
                use_bias=self.use_bias, dtype=self.dtype, name="Conv_0",
            )(x)
        if isinstance(self.padding, str):
            pad = self.padding
        else:
            pad = [(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])]
        in_ch = x.shape[-1]
        fan_in = in_ch * self.kernel_size[0] * self.kernel_size[1]
        return nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=pad,
            use_bias=self.use_bias,
            kernel_init=kaiming_uniform_init(),
            bias_init=torch_uniform_init(fan_in),
            dtype=self.dtype,
        )(x)


def max_pool_torch(
    x: jax.Array,
    window: tuple[int, int],
    strides: tuple[int, int] | None = None,
    padding: tuple[int, int] = (0, 0),
) -> jax.Array:
    """torch MaxPool2d: floor mode, -inf padding, stride defaults to window."""
    strides = strides or window
    ph, pw = padding
    # -inf init is required for XLA's select-and-scatter max-pool grad rule.
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), constant_values=neg)
    return jax.lax.reduce_window(
        x,
        neg,
        jax.lax.max,
        window_dimensions=(1, window[0], window[1], 1),
        window_strides=(1, strides[0], strides[1], 1),
        padding="VALID",
    )


def avg_pool_torch(x: jax.Array, window: int, strides: int | None = None) -> jax.Array:
    """torch AvgPool2d, floor mode, no padding."""
    s = strides or window
    # literal 0 init is required for XLA's reduce-window-add autodiff rule
    summed = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, s, s, 1),
        padding="VALID",
    )
    return summed / (window * window)


class TorchBatchNorm(nn.Module):
    """BatchNorm2d semantics on the channel (last, NHWC) axis.

    torch momentum 0.1 == flax momentum 0.9 (flax's is the running-average
    decay). eps 1e-5 matches torch. ``axis_name`` enables sync-BN inside a
    shard_map'd data-parallel epoch: batch statistics are pmean'd over the
    named mesh axis, reproducing global-batch (single-device) semantics.
    """

    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        # Stats always in float32 (bf16 batch means lose too much precision);
        # the activation dtype is preserved for the surrounding compute.
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis=-1,
            dtype=jnp.float32,
            axis_name=self.axis_name,
        )(x)
        return y.astype(x.dtype)


class LSTMLayer(nn.Module):
    """Single-direction LSTM layer over (B, T, F) → (B, T, H).

    Gate order and math follow torch.nn.LSTM (i, f, g, o); both b_ih and
    b_hh exist so checkpoints can map 1:1. The x-projection for all T steps
    is a single matmul; the scan body is one (B,H)x(H,4H) matmul.
    """

    hidden: int
    reverse: bool = False
    dtype: object = None  # compute dtype (params stay float32)

    @nn.compact
    def __call__(self, x):
        b, t, f = x.shape
        h = self.hidden
        init = torch_uniform_init(h)
        w_ih = self.param("w_ih", init, (f, 4 * h))
        w_hh = self.param("w_hh", init, (h, 4 * h))
        b_ih = self.param("b_ih", init, (4 * h,))
        b_hh = self.param("b_hh", init, (4 * h,))
        # Cast params + input to one compute dtype so the scan carry dtype is
        # stable (mixed f32 params × bf16 activations would promote h_new to
        # f32 and break the carry contract).
        dt = self.dtype or jnp.result_type(x.dtype, w_ih.dtype)
        x, w_ih, w_hh, b_ih, b_hh = (a.astype(dt) for a in (x, w_ih, w_hh, b_ih, b_hh))

        xp = jnp.einsum("btf,fg->btg", x, w_ih) + b_ih + b_hh  # (B, T, 4H)
        if self.reverse:
            xp = jnp.flip(xp, axis=1)

        def step(carry, x_t):
            h_t, c_t = carry
            gates = x_t + h_t @ w_hh
            i, fgt, g, o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            fgt = jax.nn.sigmoid(fgt)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c_new = fgt * c_t + i * g
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        h0 = jnp.zeros((b, h), x.dtype)
        c0 = jnp.zeros((b, h), x.dtype)
        _, ys = jax.lax.scan(step, (h0, c0), jnp.swapaxes(xp, 0, 1))
        ys = jnp.swapaxes(ys, 0, 1)  # (B, T, H)
        if self.reverse:
            ys = jnp.flip(ys, axis=1)
        return ys


class LSTM(nn.Module):
    """Multi-layer, optionally bidirectional LSTM (torch.nn.LSTM shape contract)."""

    hidden: int
    num_layers: int = 1
    bidirectional: bool = False
    dtype: object = None  # compute dtype (params stay float32)

    @nn.compact
    def __call__(self, x):
        for layer in range(self.num_layers):
            fwd = LSTMLayer(self.hidden, dtype=self.dtype, name=f"l{layer}_fwd")(x)
            if self.bidirectional:
                bwd = LSTMLayer(self.hidden, reverse=True, dtype=self.dtype, name=f"l{layer}_bwd")(x)
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd
        return x


def conv_bn_pool_block1(parent: nn.Module, conv: "TorchConv", bn: "TorchBatchNorm",
                        x: jax.Array, train: bool, dtype, fused: bool,
                        input_grad: bool = False) -> jax.Array:
    """First smallcnn/smalllstm block: maxpool_{1,3}(BN(relu(conv2x2(x)))).

    With ``fused`` (TPU training path) the math routes through
    ops/fused_conv_block.conv1_bn_pool — stock XLA forward, Pallas backward —
    while keeping the flax param tree bit-identical to the unfused sequence:
    the submodules are invoked on tiny dummies purely to declare their
    parameters (the dummy computations are dead code XLA removes), and the
    running-stats update reuses flax BatchNorm's own logic by feeding it a
    crafted two-sample input whose batch mean/var equal the kernel's μ/σ².

    CONTRACT: in the fused *training* path, gradients w.r.t. the block input
    ``x`` are only computed when ``input_grad=True`` (models expose this as
    ``fused_input_grad``) — otherwise dx is zeros by construction. Training
    differentiates parameters only, so the default is off; anything that
    differentiates w.r.t. the model INPUT with train=True (saliency-style
    defenses, trigger optimization against a training-mode model) must set it
    or use an unfused/eval-mode model (the eval kernel always provides dx —
    FlowMur's trigger optimization uses that path).
    """
    if not fused or x.shape[-1] != 1 or x.shape[1] < 2 or (x.shape[2] - 1) % 3 != 0:
        y = nn.relu(conv(x))
        y = bn(y, train)
        return max_pool_torch(y, (1, 3))
    from audiobd_tpu.ops.fused_conv_block import conv1_bn_pool

    features = conv.features
    _ = conv(jnp.zeros((1, 2, 2, 1), x.dtype))  # declare kernel/bias only
    _ = bn(jnp.zeros((1, 1, 2, features), jnp.float32), False)  # declare γ/β/stats
    params = parent.variables["params"]
    w = params[conv.name]["Conv_0"]["kernel"]
    b = params[conv.name]["Conv_0"]["bias"]
    gamma = params[bn.name]["BatchNorm_0"]["scale"]
    beta = params[bn.name]["BatchNorm_0"]["bias"]
    dt = dtype or x.dtype
    if train:
        out, mu, var = conv1_bn_pool(
            x, w, b, gamma, beta, train=True, compute_dtype=dt,
            need_input_grad=input_grad,
        )
        # Two samples at μ ± σ have batch mean μ and (fast-)variance σ²
        # exactly — flax BatchNorm then applies its own running update.
        s = jnp.sqrt(jnp.maximum(var, 0.0))
        stat_x = jnp.stack([mu - s, mu + s], axis=0).reshape(1, 1, 2, features)
        _ = bn(jax.lax.stop_gradient(stat_x), True)
        return out
    stats = parent.variables["batch_stats"][bn.name]["BatchNorm_0"]
    return conv1_bn_pool(
        x, w, b, gamma, beta, train=False,
        running_mean=stats["mean"], running_var=stats["var"], compute_dtype=dt,
    )


def conv_bn_pool_block2(parent: nn.Module, conv: "TorchConv", bn: "TorchBatchNorm",
                        x: jax.Array, train: bool, dtype, fused: bool,
                        pool_padding: tuple[int, int] = (1, 1)) -> jax.Array:
    """Second/third smallcnn/smalllstm block:
    maxpool_{2,2,pad pool_padding}(BN(relu(conv2x2(x)))) — block 2 uses
    pool padding (1, 1), block 3 uses (0, 1).

    With ``fused`` the TRAIN path routes through
    ops/fused_conv_block2.conv2_bn_pool — stock XLA forward, Pallas backward —
    with the same param-tree trick as conv_bn_pool_block1 (dummy submodule
    invocations declare the identical flax params; running stats update via
    the two-sample crafted input). Eval calls always take the unfused chain
    (the fused op is train-only), and unlike block1 the fused train path
    ALWAYS provides input gradients — the blocks below consume dx.
    """
    if not fused or not train or x.shape[1] < 2 or x.shape[2] < 2:
        y = nn.relu(conv(x))
        y = bn(y, train)
        return max_pool_torch(y, (2, 2), padding=pool_padding)
    from audiobd_tpu.ops.fused_conv_block2 import conv2_bn_pool

    features = conv.features
    cin = x.shape[-1]
    _ = conv(jnp.zeros((1, 2, 2, cin), x.dtype))  # declare kernel/bias only
    _ = bn(jnp.zeros((1, 1, 2, features), jnp.float32), False)  # declare γ/β/stats
    params = parent.variables["params"]
    w = params[conv.name]["Conv_0"]["kernel"]
    b = params[conv.name]["Conv_0"]["bias"]
    gamma = params[bn.name]["BatchNorm_0"]["scale"]
    beta = params[bn.name]["BatchNorm_0"]["bias"]
    dt = dtype or x.dtype
    out, mu, var = conv2_bn_pool(
        x, w, b, gamma, beta, pool_padding=pool_padding, compute_dtype=dt
    )
    # Two samples at μ ± σ have batch mean μ and (fast-)variance σ² exactly —
    # flax BatchNorm then applies its own running update.
    s = jnp.sqrt(jnp.maximum(var, 0.0))
    stat_x = jnp.stack([mu - s, mu + s], axis=0).reshape(1, 1, 2, features)
    _ = bn(jax.lax.stop_gradient(stat_x), True)
    return out


def nchw_to_nhwc(x: jax.Array, layout: str = "nchw") -> jax.Array:
    """Bring API-layout features to the conv-native NHWC.

    ``layout="nhwc"``: the caller stored features device-resident as
    (B, F, M, 1) already (TrainConfig.feature_layout) — no per-step
    relayout. The API boundary (npy contract, ArraySet) stays NCHW."""
    return x if layout == "nhwc" else jnp.transpose(x, (0, 2, 3, 1))


def flatten_nhwc_as_torch(x: jax.Array) -> jax.Array:
    """Flatten matching torch's NCHW flatten order (C, H, W)."""
    return jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
