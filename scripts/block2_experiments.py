"""Block2 formulation shootout (VERDICT r3 item 6 follow-up).

CPU HLO cost analysis says smallcnn's block2 (conv2x2 64→64 on the pooled
(B, 100, 13, 64) map) carries ~3x block1's FLOPs; smallcnn bf16 MFU was
5.28% in BENCH_r02. Before writing a windowed-DMA Pallas kernel, measure
whether the tiny W=13 spatial extent is simply mis-tiling XLA's conv and an
im2col matmul formulation (MXU-shaped: M=B·99·12, K=257, N=64) already
closes the gap — on both the forward and the parameter gradient.

Run on the TPU fixture (one JSON line per timing):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/block2_experiments.py [dtype]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from audiobd_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache("auto")

import jax  # noqa: E402

# Axon's sitecustomize pins jax_platforms; a wedged tunnel would hang the
# first device touch. B2_PLATFORM=cpu forces a local smoke run.
if os.environ.get("B2_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["B2_PLATFORM"])

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

DTYPE = jnp.bfloat16 if (len(sys.argv) < 2 or sys.argv[1] == "bfloat16") else jnp.float32
B = int(os.environ.get("B2_BATCH", 256))
ITERS = 30


def timed(fn, *args):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])  # force
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / ITERS


def conv_lax(x, k, b):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b


def conv_im2col(x, k, b):
    # 2x2 taps → channel concat: (B, H-1, W-1, 4C) @ (4C, Cout)
    p = jnp.concatenate(
        [x[:, :-1, :-1], x[:, :-1, 1:], x[:, 1:, :-1], x[:, 1:, 1:]], axis=-1
    )
    # HWIO kernel flattens to (4*Cin, Cout) in the same (kh, kw, cin) order
    # as the tap concat above — no transpose needed.
    km = k.reshape(-1, k.shape[-1])
    return jax.lax.dot_general(
        p, km, (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype) + b


def block(conv, x, k, b, g, be):
    from audiobd_tpu.models.layers import max_pool_torch

    r = jnp.maximum(conv(x, k, b), 0)
    rf = r.astype(jnp.float32)
    mu = jnp.mean(rf, axis=(0, 1, 2))
    var = jnp.mean(rf * rf, axis=(0, 1, 2)) - mu * mu
    z = ((rf - mu) * jax.lax.rsqrt(var + 1e-5) * g + be).astype(r.dtype)
    return max_pool_torch(z, (2, 2), padding=(1, 1))


def main():
    rng = np.random.default_rng(0)

    def P(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32), DTYPE)

    x = P(B, 100, 13, 64)
    k, b = P(2, 2, 64, 64), P(64)
    g, be = jnp.ones((64,), jnp.float32), jnp.zeros((64,), jnp.float32)

    rows = []
    for name, conv in (("lax_conv", conv_lax), ("im2col", conv_im2col)):
        fwd = jax.jit(lambda k, b, conv=conv: block(conv, x, k, b, g, be))
        t_f = timed(fwd, k, b)

        def loss(params, conv=conv):
            return jnp.sum(block(conv, x, params[0], params[1], g, be).astype(jnp.float32))

        gradfn = jax.jit(jax.grad(loss))
        t_g = timed(gradfn, (k, b))
        rows.append({"formulation": name, "dtype": str(np.dtype(DTYPE.dtype if hasattr(DTYPE, 'dtype') else DTYPE)),
                     "fwd_ms": round(t_f * 1e3, 3), "fwd_bwd_ms": round(t_g * 1e3, 3)})
        print(json.dumps(rows[-1]), flush=True)

    # isolated-block Pallas-backward arm (ops/fused_conv_block2): stock XLA
    # forward + fused gradient. Same math as the lax arm.
    from audiobd_tpu.ops.fused_conv_block2 import conv2_bn_pool

    fwd_p = jax.jit(lambda k, b: conv2_bn_pool(x, k, b, g, be, compute_dtype=DTYPE)[0])
    t_f = timed(fwd_p, k, b)

    def loss_p(params):
        out, _, _ = conv2_bn_pool(x, params[0], params[1], g, be, compute_dtype=DTYPE)
        return jnp.sum(out.astype(jnp.float32))

    t_g = timed(jax.jit(jax.grad(loss_p)), (k, b))
    rows.append({"formulation": "pallas_bwd", "dtype": rows[-1]["dtype"],
                 "fwd_ms": round(t_f * 1e3, 3), "fwd_bwd_ms": round(t_g * 1e3, 3)})
    print(json.dumps(rows[-1]), flush=True)

    # equality check (same math, different lowering)
    a = jax.jit(lambda: block(conv_lax, x, k, b, g, be))()
    c = jax.jit(lambda: block(conv_im2col, x, k, b, g, be))()
    p_out = fwd_p(k, b)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - c.astype(jnp.float32))))
    err_p = float(jnp.max(jnp.abs(a.astype(jnp.float32) - p_out.astype(jnp.float32))))
    print(json.dumps({"max_abs_diff": err, "max_abs_diff_pallas": err_p}), flush=True)

    # decision-grade: the FULL smallcnn train epoch under each lowering
    # (bench-identical shapes; models.TorchConv impl threaded via config)
    from audiobd_tpu.configs import make_config
    from audiobd_tpu.train.loop import ArraySet
    from audiobd_tpu.train.scan_epoch import DeviceDataset, make_perm, make_train_epoch_fn, pad_plan
    from audiobd_tpu.train.state import TrainState
    from audiobd_tpu.models import jit_init
    from audiobd_tpu.train.trainer import build_attack_model, make_optimizer

    n_clips = int(os.environ.get("B2_CLIPS", 20480))
    batch = int(os.environ.get("B2_EPOCH_BATCH", 256))
    data = ArraySet(
        rng.standard_normal((n_clips, 1, 101, 40)).astype(np.float32),
        rng.integers(0, 10, n_clips).astype(np.int64),
        (rng.random(n_clips) < 0.1).astype(np.int64),
    )
    dset = DeviceDataset(data)
    dtype_name = "bfloat16" if DTYPE == jnp.bfloat16 else "float32"
    for impl, extra in (("lax", {}), ("im2col", {"conv_impl": "im2col"}),
                        ("lax+fused_block2", {"fused_block2": "on"}),
                        ("lax+fused_block23",
                         {"fused_block2": "on", "fused_block3": "on"})):
        cfg = make_config("badnets", model="smallcnn", batch_size=batch,
                          compute_dtype=dtype_name, **extra)
        model = build_attack_model(cfg)
        tx = make_optimizer(cfg)
        variables = jit_init(model, jax.random.PRNGKey(0), data.feats[:1])
        state = TrainState.create(variables, tx)
        epoch_fn = make_train_epoch_fn(model, tx)
        n_batches, mask = pad_plan(dset.n, batch)
        perm = jnp.asarray(make_perm(np.random.default_rng(1), dset.n, n_batches, batch))
        args = (state, dset.feats, dset.labels, dset.indicators, perm, jnp.asarray(mask),
                jax.random.PRNGKey(1))
        compiled = epoch_fn.lower(*args).compile()

        def run(state):
            state, losses, sums = compiled(state, dset.feats, dset.labels, dset.indicators,
                                           perm, jnp.asarray(mask), jax.random.PRNGKey(1))
            jax.device_get(sums)
            return state

        state = run(state)
        t0 = time.perf_counter()
        for _ in range(3):
            state = run(state)
        dt = (time.perf_counter() - t0) / 3
        print(json.dumps({"epoch_conv_impl": impl, "dtype": dtype_name,
                          "epoch_sec": round(dt, 4),
                          "clips_per_sec": round(n_clips / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
