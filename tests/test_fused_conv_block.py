"""Parity tests for the Pallas-backward conv block (ops/fused_conv_block).

The op must be a drop-in for maxpool_{1,3}(BN(relu(conv2x2(x)))) — reference
utils/models.py:24-29 — in both value and gradient, and the fused model must
keep a bit-identical param tree so checkpoints interoperate. Kernels run in
interpret mode on the CPU test mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn

from audiobd_tpu.models.layers import max_pool_torch
from audiobd_tpu.models.zoo import SmallCNN
from audiobd_tpu.ops.fused_conv_block import conv1_bn_pool

C = 64


@pytest.fixture(scope="module")
def block_params():
    rng = np.random.default_rng(0)
    return (
        jnp.asarray(rng.normal(size=(2, 2, 1, C)).astype(np.float32) * 0.3),
        jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1),
        jnp.asarray(1.0 + 0.2 * rng.normal(size=(C,)).astype(np.float32)),
        jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32)),
    )


def ref_block(x, kernel, bias, gamma, beta, train, rmean=None, rvar=None):
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bias
    r = nn.relu(y)
    if train:
        mu = jnp.mean(r, axis=(0, 1, 2))
        var = jnp.mean(r**2, axis=(0, 1, 2)) - mu**2
    else:
        mu, var = rmean, rvar
    z = (r - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
    out = max_pool_torch(z, (1, 3))
    return (out, mu, var) if train else out


def rel_err(a, b):
    return float(jnp.max(jnp.abs(a - b))) / max(float(jnp.max(jnp.abs(a))), 1e-9)


@pytest.mark.parametrize("shape", [(8, 101, 40), (4, 32, 13), (4, 100, 40)])
def test_train_forward_exact(block_params, shape):
    x = jnp.asarray(np.random.default_rng(1).normal(size=(*shape, 1)).astype(np.float32))
    o0, m0, v0 = ref_block(x, *block_params, True)
    o1, m1, v1 = conv1_bn_pool(x, *block_params, train=True, tn=1024)
    # The forward is stock XLA — identical math, so exact equality.
    assert jnp.array_equal(o0, o1)
    assert jnp.array_equal(m0, m1) and jnp.array_equal(v0, v1)


@pytest.mark.parametrize("shape", [(8, 101, 40), (4, 32, 13)])
def test_train_grads_match(block_params, shape):
    x = jnp.asarray(np.random.default_rng(2).normal(size=(*shape, 1)).astype(np.float32))

    def loss_ref(args):
        out, _, _ = ref_block(args[0], *args[1:], True)
        return jnp.sum(jnp.tanh(out))

    def loss_fused(args):
        out, _, _ = conv1_bn_pool(
            args[0], *args[1:], train=True, tn=1024, need_input_grad=True
        )
        return jnp.sum(jnp.tanh(out))

    ga = jax.grad(loss_ref)((x, *block_params))
    gb = jax.grad(loss_fused)((x, *block_params))
    for name, a, b in zip("x k b gamma beta".split(), ga, gb):
        assert rel_err(a, b) < 1e-4, name


def test_eval_forward_and_grads(block_params):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, 101, 40, 1)).astype(np.float32))
    rmean = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1 + 0.5)
    rvar = jnp.asarray(np.abs(rng.normal(size=(C,)).astype(np.float32)) + 0.5)
    e0 = ref_block(x, *block_params, False, rmean, rvar)
    e1 = conv1_bn_pool(
        x, *block_params, train=False, running_mean=rmean, running_var=rvar, tn=1024
    )
    assert jnp.array_equal(e0, e1)
    ga = jax.grad(lambda a: jnp.sum(jnp.sin(ref_block(a[0], *a[1:], False, rmean, rvar))))(
        (x, *block_params)
    )
    gb = jax.grad(
        lambda a: jnp.sum(
            jnp.sin(
                conv1_bn_pool(
                    a[0], *a[1:], train=False, running_mean=rmean, running_var=rvar, tn=1024
                )
            )
        )
    )((x, *block_params))
    for name, a, b in zip("x k b gamma beta".split(), ga, gb):
        assert rel_err(a, b) < 1e-4, name


def _smallcnn_pair():
    m0 = SmallCNN(num_classes=10, linear_features=3072, fused_block1=False)
    m1 = SmallCNN(num_classes=10, linear_features=3072, fused_block1=True)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(8, 1, 101, 40)).astype(np.float32))
    v0 = m0.init(jax.random.PRNGKey(0), x, train=False)
    v1 = m1.init(jax.random.PRNGKey(0), x, train=False)
    return m0, m1, v0, v1, x


def test_model_param_tree_identical():
    _, _, v0, v1, _ = _smallcnn_pair()
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    for a, b in zip(jax.tree_util.tree_leaves(v0), jax.tree_util.tree_leaves(v1)):
        assert jnp.array_equal(a, b)


def test_model_forward_stats_and_grads_match():
    m0, m1, v0, v1, x = _smallcnn_pair()
    rngs = {"dropout": jax.random.PRNGKey(7)}
    y0, mut0 = m0.apply(v0, x, train=True, mutable=["batch_stats"], rngs=rngs)
    y1, mut1 = m1.apply(v1, x, train=True, mutable=["batch_stats"], rngs=rngs)
    assert rel_err(y0, y1) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(mut0), jax.tree_util.tree_leaves(mut1)):
        assert rel_err(a, b) < 1e-5

    def loss(params, m, v):
        y, _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, mutable=["batch_stats"], rngs=rngs,
        )
        return jnp.mean(y**2)

    g0 = jax.grad(lambda p: loss(p, m0, v0))(v0["params"])
    g1 = jax.grad(lambda p: loss(p, m1, v1))(v1["params"])
    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat1 = jax.tree_util.tree_leaves(g1)
    for (path, a), b in zip(flat0, flat1):
        assert rel_err(a, b) < 5e-4, jax.tree_util.keystr(path)


def test_model_eval_matches():
    m0, m1, v0, v1, x = _smallcnn_pair()
    y0 = m0.apply(v0, x, train=False)
    y1 = m1.apply(v1, x, train=False)
    assert rel_err(y0, y1) < 1e-6


def test_model_bf16_grads_close():
    """bf16 compute path: the shipped default for mixed-precision training.

    bf16 gradients carry ~1e-1 inherent noise on near-cancelling quantities
    (the *unfused* bf16 path is that far from f32 truth too), so the fused
    path is judged against the f32 reference: its error must not exceed the
    unfused bf16 path's error by more than bf16 noise. The forward must
    still match the unfused bf16 forward tightly (same math)."""
    x = jnp.asarray(np.random.default_rng(9).normal(size=(8, 1, 101, 40)).astype(np.float32))
    rngs = {"dropout": jax.random.PRNGKey(7)}

    def grads(dtype, fused):
        m = SmallCNN(num_classes=10, linear_features=3072, dtype=dtype, fused_block1=fused)
        v = m.init(jax.random.PRNGKey(0), x, train=False)

        def loss(params):
            y, _ = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"], rngs=rngs,
            )
            return jnp.mean(y.astype(jnp.float32) ** 2)

        y, _ = m.apply(v, x, train=True, mutable=["batch_stats"], rngs=rngs)
        return y.astype(jnp.float32), jax.grad(loss)(v["params"])

    y32, g32 = grads(None, False)
    y0, g0 = grads(jnp.bfloat16, False)
    y1, g1 = grads(jnp.bfloat16, True)
    assert rel_err(y0, y1) < 1e-5  # identical bf16 forward math

    flat32 = jax.tree_util.tree_flatten_with_path(g32)[0]
    for (path, a32), b0, b1 in zip(
        flat32, jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
    ):
        d_unfused = rel_err(a32, b0)
        d_fused = rel_err(a32, b1)
        assert d_fused < max(2.0 * d_unfused, 0.02), (
            f"{jax.tree_util.keystr(path)}: fused {d_fused:.3e} vs unfused {d_unfused:.3e}"
        )
