"""Hybrid XLA-forward / Pallas-backward conv(2x2,Cin→C) → relu → BN → maxpool(2,2,pad 1).

Block 2 of smallcnn/smalllstm (reference utils/models.py:30-35, 133-138).
The analytic attribution (VALIDATION.md round-4, CPU HLO cost analysis at the
bench shape) says this block dominates the remaining smallcnn step cost:
forward 10.8 GF (3x block1) and an XLA backward that re-reads ~4.5 GB of HLO
bytes per step re-materializing the (B, H-1, W-1, 64) activation. As with
block1 (ops/fused_conv_block.py) the forward is stock XLA — bit-identical to
the unfused module chain — and only the gradient routes through Pallas
kernels that stream im2col phase patches instead of the activation.

Differences from block1, which force a new design rather than a parameter
change:

* **64 input channels.** The conv is a (4·Cin+1 = 257)-tap matmul (4 shift
  taps × Cin channels + a ones row folding the bias), so the patch array is
  4x the input — still ~7x less traffic than XLA's measured backward, but
  the block1 "15-row patch" economics don't transfer (documented in
  CLAUDE.md / VALIDATION.md; this kernel is the 'windowed patch' follow-up).

**MEASURED DEAD END (round-4 block2_shootout, TPU v5e, bf16, B=256).** Do
NOT enable by default: the full smallcnn train epoch runs 70,889 clips/s on
stock lax.conv vs 23,640 with fused_block2 and 20,378 with fused_block2+3
(isolated block fwd+bwd: lax 1.30 ms, pallas 5.28 ms). The 257-tap im2col
patch stream is ~4x the activation bytes and loses to XLA's native conv
backward on this hardware. Kept behind ``TrainConfig.fused_block2/
fused_block3 = "on"`` for future-hardware re-evaluation only.
* **2x2/stride-2 pool with padding 1** (torch floor mode). Window (io, jo)
  covers conv-grid rows {2io-1, 2io} × cols {2jo-1, 2jo}; rows/cols -1 and
  any right/bottom overhang are -inf padding. Each conv-grid element belongs
  to exactly ONE window, so the four window slots split into four *phases*
  by (row parity, col parity) — a partition, not a duplication. Phase slots
  that fall on padding are masked out of the pool argmax via a streamed
  per-phase validity plane (their recomputed y is exactly 0 by construction
  — zero patch column and zeroed ones-row — so they already contribute
  nothing to the parameter sums: relu' = 0).
* **dx is always required** (block1 sits below this block), so the backward
  is always two passes: the merged parameter pass (dwA/dwB/dwC/S1/S2, same
  linear-in-(1,h1,h2) factoring as block1) and the dp pass, un-patched to dx
  by the jax.vjp of the (linear) patch builder.

Train mode only: the eval path (defenses' frozen evals, FlowMur's trigger
optimization) keeps the stock XLA chain — models gate this op behind
``fused_block2`` and route eval calls unfused (models/layers.py::
conv_bn_pool_block2). Tie-routing matches torch/XLA first-match window scan
order (row-major in the window = our phase order t = 2·row_parity + col_parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audiobd_tpu.ops.fused_conv_block import _auto_interpret, _pick_tn

_EPS = 1e-5


def _pool_dims(h: int, w: int, pool_pad: tuple[int, int]):
    """Conv-grid (hp, wp), pooled (ho, wo) and covering (hc, wc) extents for
    the 2x2/stride-2 floor-mode pool with per-axis padding ∈ {0, 1}.

    Window io covers conv-grid rows {2io - ph, 2io + 1 - ph}; floor mode
    (out = (n + 2·pad - 2)//2 + 1) can leave the LAST row/col of the conv
    grid outside every window (block3: pad_h = 0, odd hp). Those dropped
    positions still feed BN statistics and the dense mean terms of the
    backward, so the phase grid is sized by the covering extent
    hc = max(ho, ceil((hp + ph)/2)) and the pooled cotangent is zero-extended
    over the outputless windows (dz = 0 there; dwB/dwC still accumulate)."""
    ph, pw = pool_pad
    hp, wp = h - 1, w - 1
    ho, wo = (hp + 2 * ph - 2) // 2 + 1, (wp + 2 * pw - 2) // 2 + 1
    hc, wc = max(ho, -(-(hp + ph) // 2)), max(wo, -(-(wp + pw) // 2))
    return hp, wp, ho, wo, hc, wc


# ---------------------------------------------------------------------------
# patch building (plain JAX; linear, so jax.vjp of it reconstructs dx)


def _phase_patches2(x, compute_dtype, tn, pool_pad):
    """(B, H, W, Cin) → zero-padded (4K, Mp) phase patches, K = 4·Cin+1.

    Rows t·K+k: phase t = 2a+b for window slot (row 2io-ph+a, col 2jo-pw+b),
    tap k = 4 conv shifts × Cin channels (kh·2+kw major — matching
    kernel.reshape(4·Cin, C) row order) + a ones row (bias tap). The ones
    row is built BEFORE the pool-grid padding, so padding slots get an
    all-zero column: their recomputed y (and hence r, relu') is exactly 0.
    m indexes (b, io, jo) row-major over the COVERING grid (hc, wc)."""
    b, h, w, cin = x.shape
    ph, pw = pool_pad
    hp, wp, _, _, hc, wc = _pool_dims(h, w, pool_pad)
    x = x.astype(compute_dtype)
    taps = jnp.concatenate(
        [x[:, :-1, :-1], x[:, :-1, 1:], x[:, 1:, :-1], x[:, 1:, 1:]], axis=-1
    )  # (B, hp, wp, 4·Cin)
    pk = jnp.concatenate([taps, jnp.ones((b, hp, wp, 1), compute_dtype)], axis=-1)
    # pool grid: rows -ph..2·hc-1-ph, cols -pw..2·wc-1-pw
    pk = jnp.pad(pk, ((0, 0), (ph, 2 * hc - ph - hp), (pw, 2 * wc - pw - wp), (0, 0)))
    pk = pk.reshape(b, hc, 2, wc, 2, -1)
    pk = pk.transpose(2, 4, 5, 0, 1, 3)  # (a, b, K, B, hc, wc)
    m_valid = b * hc * wc
    p = pk.reshape(4 * (4 * cin + 1), m_valid)
    tn, mp = _pick_tn(m_valid, tn)
    if mp != m_valid:
        p = jnp.pad(p, ((0, 0), (0, mp - m_valid)))
    return p, m_valid, tn


def _phase_valid(b, hp, wp, hc, wc, pool_pad, mp):
    """(Mp, 4) f32 plane: 1 where phase t's window slot is a real conv-grid
    position, 0 on pool padding (and on the lane-pad columns)."""
    ph, pw = pool_pad
    v = jnp.ones((b, hp, wp), jnp.float32)
    v = jnp.pad(v, ((0, 0), (ph, 2 * hc - ph - hp), (pw, 2 * wc - pw - wp)))
    v = v.reshape(b, hc, 2, wc, 2).transpose(0, 1, 3, 2, 4)  # (B, hc, wc, a, b)
    m_valid = b * hc * wc
    v = v.reshape(m_valid, 4)
    if mp != m_valid:
        v = jnp.pad(v, ((0, mp - m_valid), (0, 0)))
    return v


# ---------------------------------------------------------------------------
# kernels


def _phase_rz2(p_ref, w, scale, shift, valid, round_dtype):
    """Recompute (r_t, masked z_t, pooled) per phase; same rounding contract
    as block1 (_phase_rz): r/z round through the forward compute dtype so the
    pool argmax and relu gate select exactly the element XLA's forward
    selected; comparisons stay in f32 (Mosaic has no bf16 vector compare).
    Padding slots are forced to -inf so they never win the argmax."""
    k = w.shape[0]
    rs, zts = [], []
    pooled = None
    for t in range(4):
        y = jax.lax.dot_general(
            p_ref[k * t : k * (t + 1)], w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        r = jnp.maximum(y, 0.0).astype(round_dtype).astype(jnp.float32)
        z = (r * scale + shift).astype(round_dtype).astype(jnp.float32)
        zt = jnp.where(valid[:, t : t + 1] > 0.0, z, -jnp.inf)
        rs.append(r)
        zts.append(zt)
        pooled = zt if pooled is None else jnp.maximum(pooled, zt)
    return rs, zts, pooled


def _bwd2_kernel(p_ref, g_ref, v_ref, w_ref, mu_ref, inv_ref, scale_ref, shift_ref, acc_ref):
    """Single-pass parameter backward (train mode, batch statistics).

    Identical factoring to block1's merged kernel: dy_t is linear in
    (1, h1, h2), so dw = scale∘dwA − h1∘dwB − h2∘dwC with
    dwA = Σ p·(relu'·dz), dwB = Σ p·relu', dwC = Σ p·relu'·x̂ and
    S1 = Σdz, S2 = Σdz·x̂. Accumulator rows: 0..K-1 dwA, K..2K-1 dwB,
    2K..3K-1 dwC, 3K S1, 3K+1 S2. Pool-padding slots self-exclude (r = 0 ⇒
    relu' false; z̃ = -inf ⇒ never pool-selected)."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[...]
    k, c = w.shape
    mu = mu_ref[...]
    inv = inv_ref[...]
    g = g_ref[...].astype(jnp.float32)
    rs, zts, pooled = _phase_rz2(
        p_ref, w, scale_ref[...], shift_ref[...], v_ref[...], g_ref.dtype
    )
    taken = jnp.zeros_like(pooled, dtype=bool)
    dwa = dwb = dwc = jnp.zeros((k, c), jnp.float32)
    s1 = s2 = jnp.zeros((1, c), jnp.float32)
    for t in range(4):
        m = (zts[t] == pooled) & ~taken
        taken = taken | m
        r = rs[t]
        rp = r > 0.0
        dz = jnp.where(m, g, 0.0)
        xhat = (r - mu) * inv
        p_t = p_ref[k * t : k * (t + 1)]
        t1 = jnp.where(rp, dz, 0.0)
        dwa = dwa + jax.lax.dot_general(
            p_t, t1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        s1 = s1 + jnp.sum(dz, axis=0, keepdims=True)
        s2 = s2 + jnp.sum(dz * xhat, axis=0, keepdims=True)
        rpf = rp.astype(jnp.float32)
        dwb = dwb + jax.lax.dot_general(
            p_t, rpf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dwc = dwc + jax.lax.dot_general(
            p_t, rpf * xhat, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    acc_ref[...] += jnp.concatenate([dwa, dwb, dwc, s1, s2], axis=0)


def _dp2_kernel(
    p_ref, g_ref, v_ref, w_ref, mu_ref, inv_ref, scale_ref, shift_ref,
    h1_ref, h2_ref, dp_ref,
):
    """Input-gradient pass: dp_t = w_taps^T dy_t, dy_t = relu'·(scale·dz_t −
    h1 − x̂_t·h2). Always needed — block1 consumes this block's dx."""
    w = w_ref[...]
    k = w.shape[0]
    mu = mu_ref[...]
    inv = inv_ref[...]
    scale = scale_ref[...]
    h1 = h1_ref[...]
    h2 = h2_ref[...]
    g = g_ref[...].astype(jnp.float32)
    rs, zts, pooled = _phase_rz2(p_ref, w, scale, shift_ref[...], v_ref[...], g_ref.dtype)
    taken = jnp.zeros_like(pooled, dtype=bool)
    for t in range(4):
        m = (zts[t] == pooled) & ~taken
        taken = taken | m
        r = rs[t]
        dz = jnp.where(m, g, 0.0)
        dr = scale * dz - h1 - ((r - mu) * inv) * h2
        dy = jnp.where(r > 0.0, dr, 0.0)
        # Last row of each phase is the ones (bias) tap — its cotangent is
        # discarded by the un-patch VJP; zero it so no garbage escapes.
        dp_ref[k * t : k * t + k - 1] = jax.lax.dot_general(
            w[0 : k - 1], dy, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dp_ref.dtype)
        dp_ref[k * t + k - 1 : k * t + k] = jnp.zeros((1, dy.shape[0]), dp_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers


def _vec(c):
    return pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _run_bwd2(p, g2, valid, w, mu, inv, scale, shift, tn, interpret):
    k, c = w.shape
    rows = 3 * k + 2
    return pl.pallas_call(
        _bwd2_kernel,
        grid=(p.shape[-1] // tn,),
        in_specs=[
            pl.BlockSpec((4 * k, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            _vec(c), _vec(c), _vec(c), _vec(c),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), jnp.float32),
        interpret=interpret,
    )(p, g2, valid, w, mu, inv, scale, shift)


def _run_dp2(p, g2, valid, w, mu, inv, scale, shift, h1, h2, tn, interpret):
    k, c = w.shape
    return pl.pallas_call(
        _dp2_kernel,
        grid=(p.shape[-1] // tn,),
        in_specs=[
            pl.BlockSpec((4 * k, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            _vec(c), _vec(c), _vec(c), _vec(c), _vec(c), _vec(c),
        ],
        out_specs=pl.BlockSpec((4 * k, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        interpret=interpret,
    )(p, g2, valid, w, mu, inv, scale, shift, h1, h2)


# ---------------------------------------------------------------------------
# forward math (plain XLA — bit-identical to the unfused module chain)


def _conv_relu2(x, kernel, bias, dt):
    y = jax.lax.conv_general_dilated(
        x.astype(dt), kernel.astype(dt), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias.astype(dt)
    return jnp.maximum(y, 0).astype(jnp.float32)


def _norm_pool2(r, gamma, beta, mu, var, dt, pool_pad):
    inv = jax.lax.rsqrt(var + _EPS)
    z = ((r - mu) * inv * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(dt)
    neg = -jnp.inf if z.dtype != jnp.bfloat16 else jnp.bfloat16(-jnp.inf)
    # Same lowering as models/layers.py::max_pool_torch window (2,2) pad pool_pad
    # (symmetric -inf pad + VALID reduce_window, floor mode drops overhang):
    # gradient routing is owned by the Pallas backward anyway.
    ph, pw = pool_pad
    if ph or pw:
        z = jnp.pad(z, ((0, 0), (ph, ph), (pw, pw), (0, 0)), constant_values=neg)
    out = jax.lax.reduce_window(
        z, neg, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    return out, inv


def _train_forward2(x, kernel, bias, gamma, beta, dt, pool_pad):
    r = _conv_relu2(x, kernel, bias, dt)
    mu = jnp.mean(r, axis=(0, 1, 2))
    var = jnp.mean(r * r, axis=(0, 1, 2)) - mu * mu  # flax fast variance
    out, inv = _norm_pool2(r, gamma, beta, mu, var, dt, pool_pad)
    return out, mu, var, inv


# ---------------------------------------------------------------------------
# custom_vjp core


def _bwd_common2(res, g, tn, interpret, dt_name, pool_pad):
    x, w257, mu, inv, scale, shift = res
    dt = jnp.dtype(dt_name)
    c = w257.shape[1]
    b, h, wd = x.shape[0], x.shape[1], x.shape[2]
    hp, wp, ho, wo, hc, wc = _pool_dims(h, wd, pool_pad)
    m_valid = b * hc * wc
    tn, mp = _pick_tn(m_valid, tn)
    w_dt = w257.astype(dt)

    def build(x):
        return _phase_patches2(x, dt, tn, pool_pad)[0]

    p, unpatch = jax.vjp(build, x)
    valid = _phase_valid(b, hp, wp, hc, wc, pool_pad, mp)
    # Zero-extend the cotangent over floor-dropped (outputless) windows:
    # their slots carry real activations for the dense BN mean terms but
    # receive no pooled gradient.
    g2 = g.reshape(b, ho, wo, c)
    if (hc, wc) != (ho, wo):
        g2 = jnp.pad(g2, ((0, 0), (0, hc - ho), (0, wc - wo), (0, 0)))
    g2 = g2.reshape(m_valid, c)
    if mp != m_valid:
        g2 = jnp.pad(g2, ((0, mp - m_valid), (0, 0)))
    mu2, inv2 = mu.reshape(1, c), inv.reshape(1, c)
    sc2, sh2 = scale.reshape(1, c), shift.reshape(1, c)
    acc = _run_bwd2(p, g2, valid, w_dt, mu2, inv2, sc2, sh2, tn, interpret)
    k = w257.shape[0]
    s1, s2 = acc[3 * k], acc[3 * k + 1]
    n_total = b * hp * wp  # BN statistics population: real conv positions
    h1 = scale * s1 / n_total
    h2 = scale * s2 / n_total
    dw = acc[0:k] * scale - acc[k : 2 * k] * h1 - acc[2 * k : 3 * k] * h2
    dp = _run_dp2(
        p, g2, valid, w_dt, mu2, inv2, sc2, sh2,
        h1.reshape(1, c), h2.reshape(1, c), tn, interpret,
    )
    dx = unpatch(dp)[0].astype(x.dtype)
    return dx, dw.astype(w257.dtype), s2, s1


@functools.lru_cache(maxsize=None)
def _make_train_core2(dt_name: str, tn: int, interpret: bool, pool_pad: tuple[int, int]):
    dt = jnp.dtype(dt_name)

    @jax.custom_vjp
    def core(x, w257, gamma, beta):
        cin = (w257.shape[0] - 1) // 4
        kernel, bias = w257[:-1].reshape(2, 2, cin, -1), w257[-1]
        out, mu, var, _ = _train_forward2(x, kernel, bias, gamma, beta, dt, pool_pad)
        return out, mu, var

    def fwd(x, w257, gamma, beta):
        cin = (w257.shape[0] - 1) // 4
        kernel, bias = w257[:-1].reshape(2, 2, cin, -1), w257[-1]
        out, mu, var, inv = _train_forward2(x, kernel, bias, gamma, beta, dt, pool_pad)
        scale = gamma.astype(jnp.float32) * inv
        shift = beta.astype(jnp.float32) - mu * scale
        return (out, mu, var), (x, w257, mu, inv, scale, shift)

    def bwd(res, cts):
        g, _, _ = cts  # μ/σ² feed only the (stop_gradient'ed) running stats
        return _bwd_common2(res, g, tn, interpret, dt_name, pool_pad)

    core.defvjp(fwd, bwd)
    return core


# ---------------------------------------------------------------------------
# public API


def conv2_bn_pool(
    x,
    kernel,
    bias,
    gamma,
    beta,
    *,
    pool_padding: tuple[int, int] = (1, 1),
    compute_dtype=None,
    tn: int = 1024,
    interpret: bool | None = None,
):  # noqa: D401
    """maxpool_{2,2,s2,pad pool_padding}(BN(relu(conv2x2_{Cin→C}(x)))) with a
    Pallas backward.

    Covers smallcnn/smalllstm block 2 (pool_padding (1,1)) AND block 3
    (pool_padding (0,1) — torch floor mode there drops the last conv row,
    handled by the covering-grid extension). Train mode only (batch
    statistics; eval callers use the stock XLA chain). x: (B, H, W, Cin)
    NHWC. kernel: (2, 2, Cin, C) flax conv layout. Returns (out, batch_mean,
    batch_var) with var biased (flax fast-variance semantics). The forward
    is stock XLA (bit-identical to the unfused module sequence); only the
    gradient runs through the fused kernels, and dx is always provided
    (the blocks below need it).
    """
    interpret = _auto_interpret(interpret)
    dt_name = jnp.dtype(compute_dtype or x.dtype).name
    cin, c = kernel.shape[2], kernel.shape[3]
    w257 = jnp.concatenate([kernel.reshape(4 * cin, c), bias.reshape(1, c)], axis=0)
    core = _make_train_core2(dt_name, tn, interpret, tuple(pool_padding))
    return core(x, w257, gamma, beta)
