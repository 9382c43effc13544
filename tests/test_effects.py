"""DSP-property tests for the JingleBack effect library.

Each effect is validated against its defining signal property (not samples —
see parity policy in poison/effects.py): gain in dB, tanh clipping,
chorus delay mixing, reverb tail energy, HPF frequency response, phaser
notches, and — the strongest — pitch shift moving a sine by exactly
2^(s/12).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from audiobd_tpu.poison import effects as fx

SR = 16000


def sine(freq, t=SR, sr=SR, amp=0.5):
    n = np.arange(t) / sr
    return (amp * np.sin(2 * np.pi * freq * n)).astype(np.float32)


def dominant_freq(x, sr=SR):
    spec = np.abs(np.fft.rfft(np.asarray(x) * np.hanning(len(x))))
    return np.fft.rfftfreq(len(x), 1 / sr)[np.argmax(spec)]


def test_gain_db():
    x = jnp.asarray(sine(440))
    y = fx.gain(x, 12.0)
    np.testing.assert_allclose(np.abs(np.asarray(y)).max(), 0.5 * 10 ** 0.6, rtol=1e-4)


def test_distortion_saturates():
    x = jnp.asarray(sine(440, amp=0.9))
    y = np.asarray(fx.distortion(x, 30.0))
    assert np.abs(y).max() <= 1.0
    # Heavy drive squares the sine → strong odd harmonics.
    f3 = 3 * 440
    spec = np.abs(np.fft.rfft(y))
    freqs = np.fft.rfftfreq(len(y), 1 / SR)
    h3 = spec[np.argmin(np.abs(freqs - f3))]
    h1 = spec[np.argmin(np.abs(freqs - 440))]
    assert h3 > 0.05 * h1


def test_chorus_mixes_delayed_copy():
    x = jnp.asarray(sine(440))
    y = np.asarray(fx.chorus(x, SR, rate_hz=1.0, depth=5.0, centre_delay_ms=10.0, mix=0.5))
    assert y.shape == x.shape
    assert not np.allclose(y, np.asarray(x))
    # Bounded output, same dominant frequency.
    assert np.abs(y).max() < 1.0
    assert abs(dominant_freq(y) - 440) < 5


def test_reverb_adds_tail():
    # Impulse-ish burst in the first 100 ms, then silence.
    x = np.zeros(SR, np.float32)
    x[: SR // 10] = sine(440, t=SR // 10)
    y = np.asarray(fx.reverb(jnp.asarray(x)[None], SR, room_size=0.6))[0]
    # Energy must appear in the tail region where the input is silent.
    tail_in = np.abs(x[SR // 2 :]).sum()
    tail_out = np.abs(y[SR // 2 :]).sum()
    assert tail_in == 0.0
    assert tail_out > 1.0
    # Dry level keeps the burst present.
    assert np.abs(y[: SR // 10]).max() > 0.1


def test_ladder_hpf_response():
    low = jnp.asarray(sine(100))[None]
    high = jnp.asarray(sine(4000))[None]
    y_low = np.asarray(fx.ladder_hpf12(low, SR, 1000.0))[0]
    y_high = np.asarray(fx.ladder_hpf12(high, SR, 1000.0))[0]
    # Steady-state amplitudes (skip transient).
    a_low = np.abs(y_low[SR // 2 :]).max() / 0.5
    a_high = np.abs(y_high[SR // 2 :]).max() / 0.5
    assert a_low < 0.15   # ≥ ~17 dB down at 100 Hz for a 12 dB/oct HPF @1 kHz
    assert a_high > 0.7   # passband mostly unchanged


def test_phaser_modulates():
    x = jnp.asarray(sine(1300))[None]
    y = np.asarray(fx.phaser(x, SR))[0]
    assert y.shape == (SR,)
    assert not np.allclose(y, np.asarray(x)[0], atol=1e-3)
    env = np.abs(y)
    # LFO at 1 Hz imprints amplitude modulation near the centre frequency:
    # envelope must vary substantially over the second.
    smooth = np.convolve(env, np.ones(400) / 400, mode="valid")
    assert smooth.max() - smooth.min() > 0.05


@pytest.mark.parametrize("semitones", [10.0, -5.0])
def test_pitch_shift_ratio(semitones):
    f0 = 440.0
    x = jnp.asarray(sine(f0))
    y = fx.pitch_shift(x, SR, semitones)
    assert y.shape == x.shape
    f_measured = dominant_freq(np.asarray(y)[2000:-2000])
    f_expected = f0 * 2 ** (semitones / 12)
    assert abs(f_measured - f_expected) / f_expected < 0.03, (f_measured, f_expected)


def test_boards_run_batched():
    from audiobd_tpu.poison.jingleback import get_boards

    x = jnp.asarray(np.stack([sine(300), sine(700)]))
    for i, board in enumerate(get_boards(SR)):
        y = np.asarray(board(x))
        assert y.shape == x.shape, f"style {i}"
        assert np.isfinite(y).all(), f"style {i}"
        assert not np.allclose(y, np.asarray(x)), f"style {i}"
