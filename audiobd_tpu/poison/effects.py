"""Audio effects for the JingleBack style chains, in JAX.

The reference applies six pedalboard (JUCE C++) effect chains as black boxes
(utils/styles_trigger.py:8-53). Sample-exact JUCE parity is not possible
without its binaries; these are standard published DSP algorithms with the
same parameter semantics (freeverb for Reverb, phase-vocoder pitch shift,
Moog-style ladder HPF, modulated-allpass phaser, modulated-delay chorus,
tanh-drive distortion). Parity policy per SURVEY.md §7: match downstream
clean-acc/ASR behavior, not samples.

Structure notes (TPU-first):
  * feedback-free effects (gain, distortion, chorus-with-fb-0, pitch shift)
    are pure vectorized ops — no scan;
  * recursive filters (reverb, ladder, phaser) are lax.scan over time with
    small carried state, vmapped over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from audiobd_tpu.dsp.resample import resample
from audiobd_tpu.dsp.stft import hann_window

# ---------------------------------------------------------------------------
# Memoryless / feedforward


def gain(x: jax.Array, gain_db: float) -> jax.Array:
    return x * (10.0 ** (gain_db / 20.0))


def distortion(x: jax.Array, drive_db: float = 25.0) -> jax.Array:
    """pedalboard.Distortion: tanh waveshaper with pre-gain."""
    return jnp.tanh(x * (10.0 ** (drive_db / 20.0)))


def chorus(
    x: jax.Array,
    sample_rate: int,
    rate_hz: float = 1.0,
    depth: float = 0.25,
    centre_delay_ms: float = 7.0,
    feedback: float = 0.0,
    mix: float = 0.5,
) -> jax.Array:
    """Sine-LFO modulated fractional delay, wet/dry mix.

    With feedback == 0 (all reference chains) this is a pure gather:
    wet(t) = x(t - d(t)), d(t) = centre ± depth-scaled modulation.
    ``depth`` is clamped to [0, 1] (JUCE's valid range — the reference's
    depth=5 saturates it).
    """
    assert feedback == 0.0, "feedback chorus would need a scan; reference uses 0"
    t = x.shape[-1]
    depth = float(np.clip(depth, 0.0, 1.0))
    centre = centre_delay_ms * 1e-3 * sample_rate
    mod_amp = depth * centre  # modulate around the centre delay, stay >= 0
    n = jnp.arange(t)
    lfo = jnp.sin(2.0 * jnp.pi * rate_hz * n / sample_rate)
    delay = centre + mod_amp * lfo
    pos = n - delay
    pos = jnp.clip(pos, 0.0, t - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    frac = pos - lo
    wet = x[..., lo] * (1.0 - frac) + x[..., hi] * frac
    return (1.0 - mix) * x + mix * wet


# ---------------------------------------------------------------------------
# Phase-vocoder pitch shift


def _stft_c(x, n_fft, hop):
    """Complex STFT (frames, bins) via the matmul DFT bases."""
    pad = n_fft // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    t = xp.shape[-1]
    n_frames = 1 + (t - n_fft) // hop
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]).astype(np.int32)
    frames = xp[..., idx] * jnp.asarray(hann_window(n_fft).astype(np.float32))
    n_bins = n_fft // 2 + 1
    nn = np.arange(n_fft)[:, None]
    kk = np.arange(n_bins)[None, :]
    ang = 2 * np.pi * nn * kk / n_fft
    cb = jnp.asarray(np.cos(ang).astype(np.float32))
    sb = jnp.asarray((-np.sin(ang)).astype(np.float32))
    return frames @ cb, frames @ sb  # real, imag


def _istft(re_s: jax.Array, im_s: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """iSTFT with win²-normalized overlap-add (COLA holds for hop = n_fft/4)."""
    n_bins = n_fft // 2 + 1
    n_frames = re_s.shape[-2]
    nn = np.arange(n_fft)[:, None]
    kk = np.arange(n_bins)[None, :]
    ang = 2 * np.pi * nn * kk / n_fft
    wk = np.full(n_bins, 2.0)  # onesided spectrum weights
    wk[0] = 1.0
    if n_fft % 2 == 0:
        wk[-1] = 1.0
    icb = jnp.asarray((np.cos(ang) * wk / n_fft).astype(np.float32))
    isb = jnp.asarray((np.sin(ang) * wk / n_fft).astype(np.float32))
    # x[n] = (1/N) Σ_k w_k (Re_k cos − Im_k sin): real part of the inverse DFT
    # with the forward convention Im = −Σ x sin.
    frames_t = re_s @ icb.T - im_s @ isb.T  # (..., frames, n_fft)

    win = jnp.asarray(hann_window(n_fft).astype(np.float32))
    frames_t = frames_t * win
    out_len = (n_frames - 1) * hop + n_fft
    idx = ((np.arange(n_frames) * hop)[:, None] + np.arange(n_fft)[None, :]).reshape(-1)
    norm_np = np.zeros(out_len, np.float32)
    np.add.at(norm_np, idx, np.tile((hann_window(n_fft) ** 2).astype(np.float32), n_frames))
    norm = jnp.asarray(np.maximum(norm_np, 1e-8))

    def ola(fr):
        return jnp.zeros((out_len,), fr.dtype).at[idx].add(fr.reshape(-1)) / norm

    flat = frames_t.reshape((-1,) + frames_t.shape[-2:])
    out = jax.vmap(ola)(flat).reshape(frames_t.shape[:-2] + (out_len,))
    return out[..., n_fft // 2 : out_len - n_fft // 2]  # undo centering pad


def pitch_shift(x: jax.Array, sample_rate: int, semitones: float,
                n_fft: int = 1024) -> jax.Array:
    """Phase-vocoder pitch shifter (pedalboard.PitchShift semantics: same
    duration, pitch × 2^(s/12)).

    Standard formulation (as in librosa.effects.pitch_shift): time-stretch by
    rate = 2^(−s/12) with a phase vocoder reading *fractional* analysis frame
    positions at a fixed n_fft/4 synthesis hop, then resample by 1/rate.
    Fully vectorized: gathers + cumsum, no scan.
    """
    hop = n_fft // 4
    rate = 2.0 ** (-semitones / 12.0)  # time-stretch factor
    t_len = x.shape[-1]

    re, im = _stft_c(x, n_fft, hop)  # (..., frames, bins)
    mag = jnp.sqrt(re * re + im * im + 1e-20)
    phase = jnp.arctan2(im, re)
    n_frames = re.shape[-2]
    n_bins = n_fft // 2 + 1
    omega = jnp.asarray((2.0 * np.pi * np.arange(n_bins) * hop / n_fft).astype(np.float32))

    # Fractional analysis positions for each synthesis frame.
    steps = np.arange(0.0, n_frames - 1, rate)
    lo = np.floor(steps).astype(np.int32)
    frac = jnp.asarray((steps - lo).astype(np.float32))[:, None]
    lo_j = jnp.asarray(lo)
    hi_j = jnp.asarray(np.minimum(lo + 1, n_frames - 1))

    mag_i = mag[..., lo_j, :] * (1 - frac) + mag[..., hi_j, :] * frac
    dphi = phase[..., hi_j, :] - phase[..., lo_j, :] - omega
    dphi = jnp.mod(dphi + jnp.pi, 2 * jnp.pi) - jnp.pi
    advance = omega + dphi  # per synthesis hop

    phase0 = phase[..., :1, :]
    synth_phase = phase0 + jnp.concatenate(
        [jnp.zeros_like(advance[..., :1, :]), jnp.cumsum(advance[..., :-1, :], axis=-2)], axis=-2
    )

    stretched = _istft(mag_i * jnp.cos(synth_phase), mag_i * jnp.sin(synth_phase), n_fft, hop)
    # Undo the duration change: stretched is ~T/rate long; resample back to ~T
    # (length scales by new/orig = rate, pitch by 1/rate).
    orig_f, new_f = 1000, int(round(1000 * rate))
    shifted = resample(stretched, orig_f, new_f) if orig_f != new_f else stretched
    cur = shifted.shape[-1]
    if cur >= t_len:
        return shifted[..., :t_len]
    pad = [(0, 0)] * (shifted.ndim - 1) + [(0, t_len - cur)]
    return jnp.pad(shifted, pad)


# ---------------------------------------------------------------------------
# Recursive filters (scan-based)

_FREEVERB_COMBS = np.array([1116, 1188, 1277, 1356, 1422, 1491, 1557, 1617])
_FREEVERB_ALLPASS = np.array([556, 441, 341, 225])
_FREEVERB_SR = 44100


def reverb(
    x: jax.Array,
    sample_rate: int,
    room_size: float = 0.5,
    damping: float = 0.5,
    wet_level: float = 0.33,
    dry_level: float = 0.4,
    width: float = 1.0,
) -> jax.Array:
    """Freeverb (Schroeder/Moorer: 8 damped combs + 4 allpass) — the public
    algorithm JUCE's Reverb (pedalboard.Reverb) implements."""
    comb_len = np.maximum((_FREEVERB_COMBS * sample_rate / _FREEVERB_SR).astype(int), 1)
    ap_len = np.maximum((_FREEVERB_ALLPASS * sample_rate / _FREEVERB_SR).astype(int), 1)
    feedback = room_size * 0.28 + 0.7
    damp = damping * 0.4
    input_gain = 0.015
    wet_gain = wet_level * 3.0 * (width / 2.0 + 0.5)
    dry_gain = dry_level * 2.0

    # TPU-first block processing instead of a 16000-step per-sample scan:
    # the comb write only feeds back at delay distance D, so blocks of D
    # samples are sequentially dependent only block-to-block (~30 steps, not
    # 16000). The damping lowpass inside the comb is a first-order linear
    # recurrence over *known* block inputs — an associative_scan. The series
    # allpasses couple purely at delay distance (no per-sample recurrence),
    # so their blocks are plain vector ops. ~25x over the per-sample scan.

    flat = x.reshape((-1, x.shape[-1]))
    t_len = flat.shape[-1]

    def comb_out(inp, d_len):
        """out[n] = w[n-D];  store[n] = d·store[n-1] + (1-d)·out[n];
        w[n] = inp[n] + f·store[n]  (zero-initial buffers)."""
        nb = -(-t_len // d_len)
        xb = jnp.pad(inp, ((0, 0), (0, nb * d_len - t_len))).reshape(-1, nb, d_len)
        xb = jnp.moveaxis(xb, 1, 0)  # (nb, B, D)

        def lin(a, b):  # compose first-order recurrences x_k = A x_{k-1} + b
            return a[0] * b[0], a[1] * b[0] + b[1]

        def block(carry, x_block):
            w_prev, s_prev = carry
            out = w_prev  # the writes from one block ago are this block's reads
            u = (1.0 - damp) * out
            coeff = jnp.full_like(u, damp)
            a_cum, b_cum = jax.lax.associative_scan(lin, (coeff, u), axis=1)
            store = a_cum * s_prev[:, None] + b_cum
            w = x_block + feedback * store
            return (w, store[:, -1]), out

        init = (jnp.zeros_like(xb[0]), jnp.zeros(xb.shape[1], xb.dtype))
        _, outs = jax.lax.scan(block, init, xb)
        return jnp.moveaxis(outs, 0, 1).reshape(flat.shape[0], -1)[:, :t_len]

    def allpass(sig, a_len):
        """out[n] = -sig[n] + buf[n-A];  buf[n] = sig[n] + 0.5·buf[n-A]."""
        nb = -(-t_len // a_len)
        xb = jnp.pad(sig, ((0, 0), (0, nb * a_len - t_len))).reshape(-1, nb, a_len)
        xb = jnp.moveaxis(xb, 1, 0)

        def block(buf_prev, x_block):
            out = -x_block + buf_prev
            buf = x_block + 0.5 * buf_prev
            return buf, out

        _, outs = jax.lax.scan(block, jnp.zeros_like(xb[0]), xb)
        return jnp.moveaxis(outs, 0, 1).reshape(sig.shape[0], -1)[:, :t_len]

    inp = flat * input_gain
    acc = sum(comb_out(inp, int(d)) for d in comb_len)
    for a in ap_len:
        acc = allpass(acc, int(a))
    out = acc * wet_gain + flat * dry_gain
    return out.reshape(x.shape)


def ladder_hpf12(x: jax.Array, sample_rate: int, cutoff_hz: float = 1000.0,
                 resonance: float = 0.0, drive_db: float = 0.0) -> jax.Array:
    """Moog-style 4-stage ladder, HPF12 tap (JUCE LadderFilter Mode.HPF12).

    Stages are zero-delay (TPT/trapezoidal) one-poles, so each highpass tap
    (input − lowpass) has the exact bilinear first-order response; HPF12 =
    two cascaded HP taps (12 dB/oct). Resonance feeds back from the fourth
    lowpass (0 in the reference chain).
    """
    g = float(np.tan(np.pi * cutoff_hz / sample_rate))
    big_g = g / (1.0 + g)
    k = 4.0 * resonance
    drive = 10.0 ** (drive_db / 20.0)

    def one_pole(sig, s):
        v = (sig - s) * big_g
        lp = v + s
        return lp, lp + v  # (lowpass out, new state)

    def step(state, x_t):
        s1, s2, s3, s4 = state
        u = jnp.tanh(x_t * drive - k * s4)
        lp1, s1 = one_pole(u, s1)
        hp1 = u - lp1
        lp2, s2 = one_pole(hp1, s2)
        hp2 = hp1 - lp2
        lp3, s3 = one_pole(lp2, s3)
        lp4, s4 = one_pole(lp3, s4)
        return (s1, s2, s3, s4), hp2

    def run_one(sig):
        zero = jnp.zeros((), sig.dtype)
        _, y = jax.lax.scan(step, (zero, zero, zero, zero), sig)
        return y

    flat = x.reshape((-1, x.shape[-1]))
    return jax.vmap(run_one)(flat).reshape(x.shape)


def phaser(
    x: jax.Array,
    sample_rate: int,
    rate_hz: float = 1.0,
    depth: float = 0.5,
    centre_frequency_hz: float = 1300.0,
    feedback: float = 0.0,
    mix: float = 0.5,
    stages: int = 6,
) -> jax.Array:
    """Cascaded first-order allpass stages with sine-LFO-modulated corner
    frequency (JUCE dsp::Phaser parameterization)."""
    t = x.shape[-1]
    n = np.arange(t)
    lfo = np.sin(2 * np.pi * rate_hz * n / sample_rate)
    fc = centre_frequency_hz * (2.0 ** (depth * lfo))  # sweep around centre
    fc = np.clip(fc, 20.0, sample_rate * 0.45)
    warp = np.tan(np.pi * fc / sample_rate)
    a_t = jnp.asarray(((warp - 1.0) / (warp + 1.0)).astype(np.float32))

    def step(state, inp):
        a, x_t = inp
        xs = state[:stages]
        ys = state[stages:]
        sig = x_t
        new_xs = []
        new_ys = []
        for i in range(stages):
            y = a * sig + xs[i] - a * ys[i]
            new_xs.append(sig)
            new_ys.append(y)
            sig = y
        return tuple(new_xs) + tuple(new_ys), sig

    def run_one(sig):
        zero = jnp.zeros((), sig.dtype)
        init = tuple(zero for _ in range(2 * stages))
        _, wet = jax.lax.scan(step, init, (a_t, sig))
        return (1.0 - mix) * sig + mix * wet

    flat = x.reshape((-1, x.shape[-1]))
    return jax.vmap(run_one)(flat).reshape(x.shape)
