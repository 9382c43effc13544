"""Hybrid XLA-forward / Pallas-backward conv(2x2,1→C) → relu → BN → maxpool(1,3).

This is the hot block of smallcnn/smalllstm (reference utils/models.py:24-29,
127-132): on a v5e it accounts for ~2/3 of the whole training-epoch wall time.
The models are HBM-bandwidth-bound, and XLA's *backward* pass for this block
re-reads the materialized (B, H-1, W-1, 64) activation several times (~150 ms
of a 300 ms smallcnn epoch); its *forward* already runs at the roofline
(~55 ms) and is left to XLA unchanged — measured head-to-head, a Pallas
forward (patch build + two extra passes) cannot beat XLA's fused
conv+BN+pool pipeline on this shape, so the custom_vjp keeps the stock XLA
forward (bit-identical numerics) and replaces only the gradient.

The backward never materializes the pre-pool tensor. Two tricks make the
kernels trivial, both applied *outside* the kernel in XLA:

* the 2x2 single-input-channel conv is exactly a 5-tap matmul over shifted
  copies of the input — 4 shift taps plus an all-ones row that folds the bias
  into the dot. Taps and phases merge into a (15, M) patch array whose
  sublane extent pads 15→16, avoiding the 3.2x tile-padding amplification a
  (3, 5, M) layout would pay. Zero-padded patch columns produce y = 0
  exactly, so no padding corrections are needed and db is row 4 of dw;
* the width-3 pool groups are split into three *phases* (j ≡ 0,1,2 mod 3) so
  the pool argmax is an elementwise 3-way comparison of matmul results.

    p[5t+k, m]   phase patches, k = 4 shift taps + ones, m = (b, i, j//3)
    y_t = p_t^T @ w5                    (TN,5)x(5,C) on the MXU
    r_t = round_dt(relu(y_t))           rounded to the forward compute dtype
                                        so pool masks match XLA's forward
    z_t = r_t·scale + shift             scale = γ/√(σ²+ε), shift = β − μ·scale

Two kernels stream the patches (~20 MB/batch) instead of the activation:
  C  BN-backward sums S1=Σdz, S2=Σdz·x̂   (backward, pass 1)
  D  dw (rows 0-3 = conv kernel, row 4 = bias) and optionally dp
     with the full BN backward folded in  (backward, pass 2)

Backward math (training mode, batch statistics):
  dz_t = g · 1[z_t selected by the pool, first-match ties like torch/XLA]
  dr_t = scale·dz_t − scale·S1/N − x̂_t·(scale·S2/N)   — the mean terms hit
         *every* position, so dr is dense even though dz is 1/3-sparse
  dy_t = dr_t · 1[y_t > 0]
  dw   = Σ_t p_t dy_t  (row 4 = db),  dγ = S2,  dβ = S1
Eval mode (running statistics are constants): dr_t = scale·dz_t only.

Training steps differentiate parameters only, so the dp output (a (15, Mp)
HBM write plus the un-patch transpose) is skipped unless ``need_input_grad``
(FlowMur's trigger optimization differentiates through a frozen model and
sets it implicitly via the eval path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _auto_interpret(interpret: bool | None) -> bool:
    if interpret is not None:
        return interpret
    return jax.default_backend() != "tpu"


def _pick_tn(m_valid: int, tn: int) -> tuple[int, int]:
    """(TN, Mp): backward lane-tile size and padded m extent. The kernels
    keep three (TN, C) float32 y-planes live at once, so the tile is capped.
    Prefers a tile that divides m_valid exactly — then the patch and
    cotangent arrays need no pad copy at all."""
    cap = min(tn, _round_up(m_valid, 128))
    if m_valid % 128 == 0:
        blocks = m_valid // 128
        for k in range(cap // 128, 0, -1):
            if blocks % k == 0:
                return 128 * k, m_valid
    return cap, _round_up(m_valid, cap)


# ---------------------------------------------------------------------------
# kernels


def _phase_rz(p_ref, w, scale, shift, round_dtype):
    """Recompute (r_t, z_t bf16/f32-rounded, pooled) per phase.

    r is rounded to the forward compute dtype and z is compared in that
    dtype so the pool argmax and relu gate select exactly the element the
    XLA forward selected (which materializes r and pools z in dtype) —
    otherwise f32-recomputed near-ties could route the gradient to a
    different pool element."""
    rs, zs = [], []
    pooled = None
    for t in range(3):
        y = jax.lax.dot_general(
            p_ref[5 * t : 5 * (t + 1)], w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        r = jnp.maximum(y, 0.0).astype(round_dtype).astype(jnp.float32)
        rs.append(r)
        # Round z through the compute dtype but hold/compare it in f32:
        # Mosaic has no bf16 vector compare, and f32 compares of rounded
        # values select the same element a bf16 compare would.
        z = (r * scale + shift).astype(round_dtype).astype(jnp.float32)
        zs.append(z)
        pooled = z if pooled is None else jnp.maximum(pooled, z)
    return rs, zs, pooled


def _make_bwd_merged_kernel(train_bn: bool):
    """Single-pass parameter backward.

    dy_t = relu'·(scale·dz_t − h1 − x̂_t·h2) is *linear* in (1, h1, h2), so
    dw = Σ_t p_t dy_t factors into three accumulated matrices that need no
    knowledge of S1/S2 inside the kernel:

        dw = scale∘dwA − h1∘dwB − h2∘dwC
        dwA = Σ p·(relu'·dz),  dwB = Σ p·relu',  dwC = Σ p·relu'·x̂

    One grid sweep over (p, g) produces a (17, C) accumulator:
    rows 0-4 dwA, 5-9 dwB, 10-14 dwC, 15 S1 = Σdz, 16 S2 = Σdz·x̂.
    Eval mode (running stats) needs only dwA/S1/S2 — dwB/dwC are skipped."""

    def kernel(p_ref, g_ref, w_ref, mu_ref, inv_ref, scale_ref, shift_ref, acc_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        w = w_ref[...]
        mu = mu_ref[...]
        inv = inv_ref[...]
        c = w.shape[1]
        g = g_ref[...].astype(jnp.float32)
        rs, zs, pooled = _phase_rz(p_ref, w, scale_ref[...], shift_ref[...], g_ref.dtype)
        taken = jnp.zeros_like(pooled, dtype=bool)
        dwa = dwb = dwc = jnp.zeros((5, c), jnp.float32)
        s1 = s2 = jnp.zeros((1, c), jnp.float32)
        for t in range(3):
            r = rs[t]
            p_t = p_ref[5 * t : 5 * (t + 1)]
            m = (zs[t] == pooled) & ~taken
            taken = taken | m
            rp = r > 0.0
            dz = jnp.where(m, g, 0.0)
            xhat = (r - mu) * inv
            t1 = jnp.where(rp, dz, 0.0)  # relu'·dz
            dwa = dwa + jax.lax.dot_general(
                p_t, t1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            s1 = s1 + jnp.sum(dz, axis=0, keepdims=True)
            s2 = s2 + jnp.sum(dz * xhat, axis=0, keepdims=True)
            if train_bn:
                rpf = rp.astype(jnp.float32)
                dwb = dwb + jax.lax.dot_general(
                    p_t, rpf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
                dwc = dwc + jax.lax.dot_general(
                    p_t, rpf * xhat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        acc_ref[...] += jnp.concatenate([dwa, dwb, dwc, s1, s2], axis=0)

    return kernel


def _make_dp_kernel(train_bn: bool):
    """Input-gradient pass (FlowMur's trigger optimization): dp_t = w^T dy_t.

    Needs h1 = scale·S1/N, h2 = scale·S2/N from the merged pass (train mode;
    zero in eval mode)."""

    def kernel(
        p_ref, g_ref, w_ref, mu_ref, inv_ref, scale_ref, shift_ref,
        h1_ref, h2_ref, dp_ref,
    ):
        w = w_ref[...]
        mu = mu_ref[...]
        inv = inv_ref[...]
        scale = scale_ref[...]
        h1 = h1_ref[...]
        h2 = h2_ref[...]
        g = g_ref[...].astype(jnp.float32)
        rs, zs, pooled = _phase_rz(p_ref, w, scale, shift_ref[...], g_ref.dtype)
        taken = jnp.zeros_like(pooled, dtype=bool)
        for t in range(3):
            r = rs[t]
            m = (zs[t] == pooled) & ~taken
            taken = taken | m
            dz = jnp.where(m, g, 0.0)
            if train_bn:
                dr = scale * dz - h1 - ((r - mu) * inv) * h2
            else:
                dr = scale * dz
            dy = jnp.where(r > 0.0, dr, 0.0)
            # Row 4 is the ones (bias) tap — its cotangent is discarded by
            # the un-patch VJP; zero it so no garbage escapes.
            dp_ref[5 * t : 5 * t + 4] = jax.lax.dot_general(
                w[0:4], dy, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dp_ref.dtype)
            dp_ref[5 * t + 4 : 5 * t + 5] = jnp.zeros((1, dy.shape[0]), dp_ref.dtype)

    return kernel


# ---------------------------------------------------------------------------
# pallas_call wrappers


def _vec(c):
    return pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _pblock(tn):
    return pl.BlockSpec((15, tn), lambda i: (0, i), memory_space=pltpu.VMEM)


def _run_bwd_merged(p, g, w, mu, inv, scale, shift, train_bn, tn, interpret):
    c = w.shape[1]
    return pl.pallas_call(
        _make_bwd_merged_kernel(train_bn),
        grid=(p.shape[-1] // tn,),
        in_specs=[
            _pblock(tn),
            pl.BlockSpec((tn, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            _vec(c), _vec(c), _vec(c), _vec(c),
        ],
        out_specs=pl.BlockSpec((17, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((17, c), jnp.float32),
        interpret=interpret,
    )(p, g, w, mu, inv, scale, shift)


def _run_dp(p, g, w, mu, inv, scale, shift, h1, h2, train_bn, tn, interpret):
    c = w.shape[1]
    return pl.pallas_call(
        _make_dp_kernel(train_bn),
        grid=(p.shape[-1] // tn,),
        in_specs=[
            _pblock(tn),
            pl.BlockSpec((tn, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            _vec(c), _vec(c), _vec(c), _vec(c), _vec(c), _vec(c),
        ],
        out_specs=_pblock(tn),
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        interpret=interpret,
    )(p, g, w, mu, inv, scale, shift, h1, h2)


# ---------------------------------------------------------------------------
# patch building (plain JAX; linear, so jax.vjp of it reconstructs dx)


def _phase_patches(x2, compute_dtype, tn):
    """(B, H, W) → zero-padded (15, Mp) phase patches + (M', TN, H', Wp).

    Rows 5t+k: phase t ∈ {0,1,2}, tap k = 4 conv shifts + an all-ones bias
    row. Built as contiguous shifts + one fused transpose (moveaxis of the
    phase axis) — strided ``j::3`` lane-slices cost ~2.3x more in relayouts."""
    b, h, w = x2.shape
    hp, wc = h - 1, w - 1
    assert wc % 3 == 0, f"fused conv block needs (W-1) % 3 == 0, got W={w}"
    wp = wc // 3
    x2 = x2.astype(compute_dtype)
    xs = jnp.stack(
        [x2[:, :-1, :-1], x2[:, :-1, 1:], x2[:, 1:, :-1], x2[:, 1:, 1:]], axis=0
    )  # (4, B, H', W')
    # j = 3*t' + t  →  (..., Wp, 3); phase axis to the front in one transpose.
    phases = jnp.moveaxis(xs.reshape(4, b, hp, wp, 3), -1, 0)
    m_valid = b * hp * wp
    p = phases.reshape(3, 4, m_valid)
    p = jnp.concatenate([p, jnp.ones((3, 1, m_valid), compute_dtype)], axis=1)
    p = p.reshape(15, m_valid)
    tn, mp = _pick_tn(m_valid, tn)
    if mp != m_valid:
        p = jnp.pad(p, ((0, 0), (0, mp - m_valid)))
    return p, m_valid, tn, hp, wp


# ---------------------------------------------------------------------------
# forward math (plain XLA — already roofline-bound on TPU for this shape)


def _conv_relu(x, kernel, bias, dt):
    y = jax.lax.conv_general_dilated(
        x.astype(dt), kernel.astype(dt), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias.astype(dt)
    return jnp.maximum(y, 0).astype(jnp.float32)


def _norm_pool(r, gamma, beta, mu, var, dt):
    inv = jax.lax.rsqrt(var + _EPS)
    z = ((r - mu) * inv * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(dt)
    # reduce_window, not reshape-max: identical values, but the reshape
    # splits W across sublane tiles and costs a relayout (~60% on the whole
    # forward). Gradient routing is owned by the Pallas backward anyway.
    out = jax.lax.reduce_window(
        z, -jnp.inf if z.dtype != jnp.bfloat16 else jnp.bfloat16(-jnp.inf),
        jax.lax.max, (1, 1, 3, 1), (1, 1, 3, 1), "VALID",
    )
    return out, inv


def _train_forward(x, kernel, bias, gamma, beta, dt):
    r = _conv_relu(x, kernel, bias, dt)
    mu = jnp.mean(r, axis=(0, 1, 2))
    var = jnp.mean(r * r, axis=(0, 1, 2)) - mu * mu
    out, inv = _norm_pool(r, gamma, beta, mu, var, dt)
    return out, mu, var, inv


# ---------------------------------------------------------------------------
# custom_vjp cores (static config closed over via cached factories)


def _bwd_common(res, g, train_bn, tn, interpret, need_input_grad, dt_name):
    x, w5, mu, inv, scale, shift = res
    dt = jnp.dtype(dt_name)
    c = w5.shape[1]
    bsz = x.shape[0]
    w5_dt = w5.astype(dt)

    m_valid = bsz * (x.shape[1] - 1) * ((x.shape[2] - 1) // 3)
    tn, _ = _pick_tn(m_valid, tn)  # clamp exactly as the patch builder does

    def build(x):
        return _phase_patches(x[..., 0], dt, tn)[0]

    if need_input_grad:
        p, unpatch = jax.vjp(build, x)
    else:
        p = build(jax.lax.stop_gradient(x))
    mp = p.shape[-1]
    g2 = g.reshape(m_valid, c)
    if mp != m_valid:
        g2 = jnp.pad(g2, ((0, mp - m_valid), (0, 0)))
    mu2, inv2 = mu.reshape(1, c), inv.reshape(1, c)
    sc2, sh2 = scale.reshape(1, c), shift.reshape(1, c)
    acc = _run_bwd_merged(p, g2, w5_dt, mu2, inv2, sc2, sh2, train_bn, tn, interpret)
    s1, s2 = acc[15], acc[16]
    dw = acc[0:5] * scale  # dwA is accumulated without the per-channel scale
    if train_bn:
        n_total = 3 * m_valid
        h1 = scale * s1 / n_total
        h2 = scale * s2 / n_total
        dw = dw - acc[5:10] * h1 - acc[10:15] * h2
    else:
        h1 = h2 = jnp.zeros_like(s1)
    if need_input_grad:
        dp = _run_dp(
            p, g2, w5_dt, mu2, inv2, sc2, sh2, h1.reshape(1, c), h2.reshape(1, c),
            train_bn, tn, interpret,
        )
        dx = unpatch(dp)[0].astype(x.dtype)
    else:
        dx = jnp.zeros_like(x)
    return dx, dw.astype(w5.dtype), s2, s1


@functools.lru_cache(maxsize=None)
def _make_train_core(dt_name: str, tn: int, interpret: bool, need_input_grad: bool):
    dt = jnp.dtype(dt_name)

    @jax.custom_vjp
    def core(x, w5, gamma, beta):
        kernel, bias = w5[0:4].reshape(2, 2, 1, -1), w5[4]
        out, mu, var, _ = _train_forward(x, kernel, bias, gamma, beta, dt)
        return out, mu, var

    def fwd(x, w5, gamma, beta):
        kernel, bias = w5[0:4].reshape(2, 2, 1, -1), w5[4]
        out, mu, var, inv = _train_forward(x, kernel, bias, gamma, beta, dt)
        scale = gamma.astype(jnp.float32) * inv
        shift = beta.astype(jnp.float32) - mu * scale
        return (out, mu, var), (x, w5, mu, inv, scale, shift)

    def bwd(res, cts):
        g, _, _ = cts  # μ/σ² feed only the (stop_gradient'ed) running stats
        return _bwd_common(res, g, True, tn, interpret, need_input_grad, dt_name)

    core.defvjp(fwd, bwd)
    return core


@functools.lru_cache(maxsize=None)
def _make_eval_core(dt_name: str, tn: int, interpret: bool):
    dt = jnp.dtype(dt_name)

    @jax.custom_vjp
    def core(x, w5, gamma, beta, mean, var):
        kernel, bias = w5[0:4].reshape(2, 2, 1, -1), w5[4]
        r = _conv_relu(x, kernel, bias, dt)
        out, _ = _norm_pool(
            r, gamma, beta, mean.astype(jnp.float32), var.astype(jnp.float32), dt
        )
        return out

    def fwd(x, w5, gamma, beta, mean, var):
        kernel, bias = w5[0:4].reshape(2, 2, 1, -1), w5[4]
        mu = mean.astype(jnp.float32)
        r = _conv_relu(x, kernel, bias, dt)
        out, inv = _norm_pool(r, gamma, beta, mu, var.astype(jnp.float32), dt)
        scale = gamma.astype(jnp.float32) * inv
        shift = beta.astype(jnp.float32) - mu * scale
        return out, (x, w5, mu, inv, scale, shift)

    def bwd(res, g):
        # Eval-mode grads flow to the input (FlowMur optimizes its trigger
        # through a frozen surrogate); running-stat cotangents are zero.
        dx, dw, dgamma, dbeta = _bwd_common(res, g, False, tn, interpret, True, dt_name)
        zero = jnp.zeros_like(res[2])
        return dx, dw, dgamma, dbeta, zero, zero

    core.defvjp(fwd, bwd)
    return core


# ---------------------------------------------------------------------------
# public API


def conv1_bn_pool(
    x,
    kernel,
    bias,
    gamma,
    beta,
    *,
    train: bool,
    running_mean=None,
    running_var=None,
    compute_dtype=None,
    tn: int = 2048,
    interpret: bool | None = None,
    need_input_grad: bool = False,
):  # noqa: D401
    """maxpool_{1,3}(BN(relu(conv2x2_{1→C}(x)))) with a Pallas backward.

    x: (B, H, W, 1) NHWC. kernel: (2, 2, 1, C) flax conv layout. In training
    mode returns (out (B, H-1, (W-1)//3, C), batch_mean (C,), batch_var (C,))
    with var biased (flax fast-variance semantics); in eval mode normalizes
    with the supplied running stats and returns just out. The forward is
    stock XLA (bit-identical to the unfused module sequence); only the
    gradient runs through the fused kernels. ``need_input_grad`` enables the
    dx path in training mode (the eval path always provides it).
    """
    interpret = _auto_interpret(interpret)
    dt_name = jnp.dtype(compute_dtype or x.dtype).name
    c = kernel.shape[-1]
    w5 = jnp.concatenate([kernel.reshape(4, c), bias.reshape(1, c)], axis=0)
    if train:
        core = _make_train_core(dt_name, tn, interpret, need_input_grad)
        return core(x, w5, gamma, beta)
    assert running_mean is not None and running_var is not None
    core = _make_eval_core(dt_name, tn, interpret)
    return core(x, w5, gamma, beta, running_mean, running_var)
