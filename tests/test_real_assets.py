"""Attack-asset tests against the GENUINE reference trigger files.

The reference ships resources/Ultrasonic/trigger.wav (1 s mono 44.1 kHz,
>20 kHz content — loaded at utils/ultra_trigger.py:24) and
resources/DABA/trigger_pool/*.wav (60 one-second 16 kHz music clips —
utils/daba_injection_tools.py:127). When a reference checkout is reachable
(see audiobd_tpu/utils/assets.py), these tests exercise the real assets
through the ultrasonic mask grid and the DABA Cer/Inf selection path.
"""

import numpy as np
import pytest

from audiobd_tpu.utils.assets import find_resource

ULTRA_WAV = find_resource("Ultrasonic/trigger.wav")
DABA_POOL = find_resource("DABA/trigger_pool")

needs_ultra = pytest.mark.skipif(ULTRA_WAV is None, reason="reference Ultrasonic asset not reachable")
needs_daba = pytest.mark.skipif(DABA_POOL is None, reason="reference DABA pool not reachable")


@needs_ultra
def test_real_ultrasonic_asset_is_ultrasonic():
    from audiobd_tpu.data.wavio import read_wav

    wav, sr = read_wav(ULTRA_WAV)
    assert sr == 44100 and wav.shape == (1, 44100)
    spec = np.abs(np.fft.rfft(wav[0].astype(np.float64)))
    freqs = np.fft.rfftfreq(44100, d=1 / 44100)
    audible = spec[freqs < 20000].sum()
    ultrasonic = spec[freqs >= 20000].sum()
    assert ultrasonic > 10 * audible  # energy overwhelmingly above 20 kHz


@needs_ultra
@pytest.mark.parametrize("size", [15, 30, 45, 60])
@pytest.mark.parametrize("pos", ["start", "mid", "end"])
@pytest.mark.parametrize("cont", [True, False])
def test_real_ultrasonic_mask_grid(size, pos, cont):
    """The reference smoke block's sweep (utils/ultra_trigger.py:113-122)
    run on the genuine asset."""
    from audiobd_tpu.poison.ultrasonic import DIVIDER, UltrasonicTrigger

    trig = UltrasonicTrigger(size, pos, cont=cont, wave_path=ULTRA_WAV).trigger()
    assert trig.shape == (1, 44100)
    nonzero = np.flatnonzero(trig[0])
    assert nonzero.size > 0
    points = (44100 // DIVIDER) * size
    if cont:
        # One contiguous window of ≈ size% of the second, placed per pos —
        # every kept sample must fall inside it.
        span = nonzero[-1] - nonzero[0] + 1
        assert span <= points
        if pos == "start":
            assert nonzero[-1] <= points - 1
        elif pos == "end":
            assert nonzero[0] >= 44100 - points
        else:
            mid = 44100 // 2
            assert nonzero[0] >= mid - points // 2 and nonzero[-1] <= mid + points // 2
    else:
        # Five evenly-spaced chunks starting at multiples of t//5, each
        # points/5 samples long — every kept sample must fall inside one.
        length = points // 5 - 1
        in_window = np.zeros(44100, dtype=bool)
        for c in range(0, 44100, 8820):
            in_window[c : c + length + 1] = True
        assert in_window[nonzero].all()
        assert nonzero.size <= points
    # Masking only ever zeros samples — kept samples match the asset exactly.
    from audiobd_tpu.data.wavio import read_wav

    raw, _ = read_wav(ULTRA_WAV)
    np.testing.assert_array_equal(trig[0][nonzero], raw[0][nonzero])


@needs_ultra
def test_ultrasonic_resolution_prefers_real_asset(tmp_path):
    from audiobd_tpu.configs import make_config
    from audiobd_tpu.poison.ultrasonic import resolve_trigger_wave_path

    cfg = make_config("ultrasonic", result=str(tmp_path / "res"))
    assert resolve_trigger_wave_path(cfg) == ULTRA_WAV


@needs_daba
def test_real_daba_pool_loads():
    from audiobd_tpu.poison.daba import load_trigger_pool

    pool = load_trigger_pool(DABA_POOL, sr=16000)
    assert pool.shape == (60, 16000)
    assert np.abs(pool).max() <= 1.0
    # all clips carry signal
    assert (np.abs(pool).max(axis=1) > 1e-3).all()


@needs_daba
def test_real_daba_cer_inf_selection():
    """Cer entropy + Inf cross-entropy selection over the genuine pool
    (reference trigger_selection_hosts_selection,
    utils/daba_selection_tools.py:154-160)."""
    from audiobd_tpu.configs import make_config
    from audiobd_tpu.poison import daba

    cfg = make_config("daba", model="smallcnn", result="_real_asset_test")
    pool = daba.load_trigger_pool(DABA_POOL, sr=16000)
    rng = np.random.default_rng(0)
    hosts = (0.1 * rng.standard_normal((40, 16000))).astype(np.float32)

    trig_idx, chosen = daba.select_trigger_and_hosts(cfg, pool, hosts, poison_num=8)
    assert 0 <= trig_idx < 60
    assert chosen.shape == (8,)
    assert len(set(chosen.tolist())) == 8
    assert (np.sort(chosen) == chosen).all()

    # Cer scores are finite entropies over num_classes
    _, _, softmax_fn = daba.make_victim_scorer(cfg)
    cer = daba.cer_scores(softmax_fn, pool)
    assert cer.shape == (60,)
    assert np.isfinite(cer).all()
    assert (cer >= 0).all() and (cer <= np.log2(cfg.num_classes) + 1e-5).all()

    inf = daba.inf_scores(softmax_fn, pool[trig_idx], hosts, po_db=cfg.po_db)
    assert inf.shape == (40,)
    assert np.isfinite(inf).all()


@needs_daba
def test_daba_resolution_prefers_real_pool(tmp_path):
    from audiobd_tpu.configs import make_config
    from audiobd_tpu.poison.daba import resolve_trigger_pool_dir

    cfg = make_config("daba", result=str(tmp_path / "res"))
    assert resolve_trigger_pool_dir(cfg) == DABA_POOL
