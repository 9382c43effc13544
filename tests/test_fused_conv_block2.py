"""Parity tests for the Pallas-backward SECOND conv block (ops/fused_conv_block2).

The op must be a drop-in for maxpool_{2,2,pad 1}(BN(relu(conv2x2_{Cin→C}(x))))
— reference utils/models.py:30-35 — in value and gradient (including dx:
block1 sits below and consumes it), and the fused model must keep a
bit-identical param tree so checkpoints interoperate. Train-mode only by
design; eval calls route through the stock XLA chain. Kernels run in
interpret mode on the CPU test mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn

# The round-4 shootout measured these kernels a 3.5x LOSS end-to-end (lax
# 70.9k clips/s vs fused 20.4-23.6k; see ops/fused_conv_block2.py docstring)
# — they will never default on. Parity coverage stays, but out of the fast
# gate on the 1-core host.
pytestmark = pytest.mark.slow

from audiobd_tpu.models.layers import max_pool_torch
from audiobd_tpu.models.zoo import SmallCNN
from audiobd_tpu.ops.fused_conv_block2 import conv2_bn_pool


def make_params(cin, c, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(2, 2, cin, c)).astype(np.float32) * 0.3),
        jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1),
        jnp.asarray(1.0 + 0.2 * rng.normal(size=(c,)).astype(np.float32)),
        jnp.asarray(0.1 * rng.normal(size=(c,)).astype(np.float32)),
    )


def ref_block(x, kernel, bias, gamma, beta, pool_pad=(1, 1)):
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bias
    r = nn.relu(y)
    mu = jnp.mean(r, axis=(0, 1, 2))
    var = jnp.mean(r**2, axis=(0, 1, 2)) - mu**2
    z = (r - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
    return max_pool_torch(z, (2, 2), padding=pool_pad), mu, var


def rel_err(a, b):
    return float(jnp.max(jnp.abs(a - b))) / max(float(jnp.max(jnp.abs(a))), 1e-9)


# odd/even conv-grid extents exercise both right/bottom-overhang cases of the
# floor-mode pool; (8, 100, 13, 64) is smallcnn block2's real input shape
# (block1 out for the badnets 101x40 features, pooled W 39//3 = 13) and
# (8, 50, 7, 64) is block3's, where pool padding (0, 1) floor-DROPS the last
# conv row — it still feeds BN statistics and the dense mean terms.
CASES = [
    ((3, 12, 13, 8, 16), (1, 1)),
    ((2, 13, 12, 8, 8), (1, 1)),
    ((8, 100, 13, 64, 64), (1, 1)),
    ((3, 12, 13, 8, 16), (0, 1)),
    ((8, 50, 7, 64, 32), (0, 1)),
    ((2, 13, 12, 8, 8), (0, 0)),
]


@pytest.mark.parametrize("shape,pool_pad", CASES)
def test_train_forward_exact(shape, pool_pad):
    b, h, w, cin, c = shape
    params = make_params(cin, c)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(b, h, w, cin)).astype(np.float32))
    o0, m0, v0 = ref_block(x, *params, pool_pad=pool_pad)
    o1, m1, v1 = conv2_bn_pool(x, *params, pool_padding=pool_pad)
    # The forward is stock XLA — identical math, so exact equality.
    assert jnp.array_equal(o0, o1)
    assert jnp.array_equal(m0, m1) and jnp.array_equal(v0, v1)


@pytest.mark.parametrize("shape,pool_pad", CASES[:2] + CASES[3:])
def test_train_grads_match(shape, pool_pad):
    b, h, w, cin, c = shape
    params = make_params(cin, c, seed=3)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(b, h, w, cin)).astype(np.float32))

    def loss_ref(args):
        out, _, _ = ref_block(*args, pool_pad=pool_pad)
        return jnp.sum(jnp.tanh(out))

    def loss_fused(args):
        out, _, _ = conv2_bn_pool(*args, pool_padding=pool_pad)
        return jnp.sum(jnp.tanh(out))

    ga = jax.grad(loss_ref)((x, *params))
    gb = jax.grad(loss_fused)((x, *params))
    for name, a, b_ in zip("x k b gamma beta".split(), ga, gb):
        assert rel_err(a, b_) < 1e-4, name


def _smallcnn_pair():
    x = jnp.asarray(np.random.default_rng(5).normal(size=(8, 1, 101, 40)).astype(np.float32))
    m0 = SmallCNN(num_classes=10, linear_features=3072)
    m1 = SmallCNN(num_classes=10, linear_features=3072, fused_block2=True)
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
    # eval calls bypass the fused op entirely (train-only by design).
    m0, m1, v0, v1, x = _smallcnn_pair()
    y0 = m0.apply(v0, x, train=False)
    y1 = m1.apply(v1, x, train=False)
    assert jnp.array_equal(y0, y1)


def test_both_blocks_fused_together():
    """fused blocks 1+2+3 compose: block3's dx feeds block2's backward,
    block2's dx feeds block1's (block1 itself skips dx by default)."""
    x = jnp.asarray(np.random.default_rng(8).normal(size=(4, 1, 101, 40)).astype(np.float32))
    rngs = {"dropout": jax.random.PRNGKey(3)}
    m0 = SmallCNN(num_classes=10, linear_features=3072)
    m2 = SmallCNN(num_classes=10, linear_features=3072,
                  fused_block1=True, fused_block2=True, fused_block3=True)
    v = m0.init(jax.random.PRNGKey(1), x, train=False)

    def loss(m, params):
        y, _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, mutable=["batch_stats"], rngs=rngs,
        )
        return jnp.mean(y**2)

    g0 = jax.grad(lambda p: loss(m0, p))(v["params"])
    g2 = jax.grad(lambda p: loss(m2, p))(v["params"])
    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat2 = jax.tree_util.tree_leaves(g2)
    for (path, a), b in zip(flat0, flat2):
        assert rel_err(a, b) < 5e-4, jax.tree_util.keystr(path)


def test_bf16_forward_identical_grads_close():
    x = jnp.asarray(np.random.default_rng(9).normal(size=(4, 12, 13, 8)).astype(np.float32))
    params = make_params(8, 16, seed=11)

    def fwd_ref(dt):
        xd = x.astype(dt)
        kd = tuple(p.astype(dt) for p in params[:2])
        y = jax.lax.conv_general_dilated(
            xd, kd[0], (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + kd[1]
        r = nn.relu(y).astype(jnp.float32)
        mu = jnp.mean(r, axis=(0, 1, 2))
        var = jnp.mean(r**2, axis=(0, 1, 2)) - mu**2
        z = ((r - mu) * jax.lax.rsqrt(var + 1e-5) * params[2] + params[3]).astype(dt)
        return max_pool_torch(z, (2, 2), padding=(1, 1))

    o_ref = fwd_ref(jnp.bfloat16)
    o_fused, _, _ = conv2_bn_pool(x, *params, compute_dtype=jnp.bfloat16)
    assert jnp.array_equal(o_ref, o_fused)

    def loss(args):
        out, _, _ = conv2_bn_pool(*args, compute_dtype=jnp.bfloat16)
        return jnp.sum(jnp.tanh(out.astype(jnp.float32)))

    g = jax.grad(loss)((x, *params))
    for leaf in g:
        assert np.isfinite(np.asarray(leaf, np.float32)).all()
