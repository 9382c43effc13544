"""Speech Commands ingest + the record/ npy cache contract.

Reference behavior reproduced (prepare_dataset.py:49-112):
  * walk ``data/<label>/*.wav``, resample to the attack's rate, keep only
    clips of at least 1 s (this length filter — not the no-op slice at
    prepare_dataset.py:62 — is what standardizes clips; SURVEY.md §6b.1),
  * truncate to exactly 1 s, compute MFCC, 80/20 split with
    sklearn train_test_split(random_state=35) for split parity,
  * cache six npys under ``record/<result>/<dataset>/clean/``.

TPU-first difference: MFCCs are computed in device batches (one jitted call
per chunk of clips) instead of per-file on the host — the reference's
cold-path hot loop (SURVEY.md §3.1).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from sklearn.model_selection import train_test_split

from audiobd_tpu.configs import AttackConfig
from audiobd_tpu.data.wavio import read_wav
from audiobd_tpu.dsp import MFCCParams, mfcc_features, resample

_CLEAN_FILES = (
    "clean_train_wav",
    "clean_test_wav",
    "clean_train_mfcc",
    "clean_test_mfcc",
    "clean_train_label",
    "clean_test_label",
)


@dataclass
class CleanData:
    train_wav: np.ndarray   # (N, 1, T)
    test_wav: np.ndarray
    train_mfcc: np.ndarray  # (N, 1, frames, n_mfcc)
    test_mfcc: np.ndarray
    train_label: np.ndarray
    test_label: np.ndarray
    # Device-resident copies of the MFCCs, populated when the prep just
    # computed them on device (prepare_clean_dataset) — poisoning adopts
    # them zero-copy instead of re-uploading the host arrays.
    train_mfcc_dev: jax.Array | None = None
    test_mfcc_dev: jax.Array | None = None


def mfcc_params(cfg: AttackConfig) -> MFCCParams:
    return MFCCParams(
        sample_rate=cfg.dsp.sample_rate,
        n_mfcc=cfg.dsp.n_mfcc,
        n_fft=cfg.dsp.n_fft,
        hop_length=cfg.dsp.hop_length,
        n_mels=cfg.dsp.n_mels,
        parity=cfg.dsp.parity,
    )


def batched_mfcc_device(
    wavs, params: MFCCParams, chunk: int = 2048, use_pallas: bool | None = None
) -> jax.Array:
    """Device-resident batched MFCC over (N, 1, T) → (N, 1, frames, n_mfcc).

    One compiled program per chunk shape; all chunks are DISPATCHED before
    anything is fetched (the chunks pipeline on device — a per-chunk
    device_get would serialize compute with tunnel transfers), and the
    result stays on device (jnp.concatenate) for the caller to train from
    (DeviceDataset adopts it without a host round trip) or to np.asarray
    once for the npy cache contract.
    """
    from audiobd_tpu.poison.device_prep import dequantize_pcm, host_wav_cast

    if use_pallas and jax.default_backend() not in ("cpu",):
        from audiobd_tpu.ops.pallas_mfcc import fused_mfcc_features

        # fused_mfcc_features accepts (N, T) and (N, 1, T) alike
        fn = jax.jit(lambda w: fused_mfcc_features(dequantize_pcm(w), params))
    else:
        fn = jax.jit(lambda w: mfcc_features(dequantize_pcm(w), params))
    outs = []
    n = len(wavs)
    if n == 0:
        # zero-rate poisoning (clean-control runs) hands in an empty subset;
        # jnp.concatenate([]) below would raise, so derive the output shape
        # without dispatching anything.
        probe = jax.ShapeDtypeStruct((1,) + tuple(np.shape(wavs))[1:], jnp.float32)
        out = jax.eval_shape(fn, probe)
        return jnp.zeros((0,) + out.shape[1:], out.dtype)
    is_host = not isinstance(wavs, jax.Array)
    for start in range(0, n, chunk):
        block = wavs[start : start + chunk]
        pad = 0
        if len(block) < chunk and n > chunk:
            pad = chunk - len(block)  # pad to keep a single compiled shape
            if is_host:
                block = np.concatenate(
                    [np.asarray(block), np.asarray(block[:1]).repeat(pad, axis=0)]
                )
            else:
                # device-resident input: pad on device — np.asarray here would
                # pull the chunk over the host link and push it back.
                block = jnp.concatenate([block, jnp.repeat(block[:1], pad, axis=0)])
        # integer PCM ships as-is over the host link (half the bytes) and is
        # dequantized on device inside fn; everything else goes up as f32.
        if is_host:
            x = jnp.asarray(host_wav_cast(block))
        else:
            x = block if jnp.issubdtype(block.dtype, jnp.integer) else block.astype(jnp.float32)
        out = fn(x)
        outs.append(out[: out.shape[0] - pad] if pad else out)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def batched_mfcc(
    wavs: np.ndarray, params: MFCCParams, chunk: int = 512, use_pallas: bool | None = None
) -> np.ndarray:
    """Host-output wrapper of batched_mfcc_device (the record/ npy contract)."""
    return np.asarray(batched_mfcc_device(wavs, params, chunk=chunk, use_pallas=use_pallas))


def clean_dir(cfg: AttackConfig) -> str:
    return os.path.join(cfg.record_dir, cfg.dataset, "clean")


def prepare_clean_dataset(
    cfg: AttackConfig,
    data_path: str | None = None,
    save: bool = True,
) -> CleanData:
    data_path = data_path or cfg.data_path
    sr = cfg.dsp.sample_rate
    waveform_to_consider = sr  # exactly 1 s at the attack's rate
    params = mfcc_params(cfg)

    from audiobd_tpu.data.native import decode_batch, decode_batch_pcm16

    # int16 PCM ingest (the dataset is PCM16 throughout): the native decoder
    # hands back RAW samples which ship to the device at HALF the f32 bytes
    # and are dequantized inside the MFCC program (exactly — 2⁻¹⁵ is a power
    # of two, so the values match the f32 decode bit-for-bit). Non-PCM16
    # files (IEEE-float wavs, odd widths, or no native toolchain) fall back
    # to the f32 batch decoder; off-rate files take the resample path.
    rows_i16, idx_i16 = [], []   # raw PCM rows + their positions
    rows_f32, idx_f32 = [], []   # fallback/resampled f32 rows + positions
    labels = []
    for label_idx, label in enumerate(cfg.labels):
        label_path = os.path.join(data_path, label)
        if not os.path.isdir(label_path):
            raise FileNotFoundError(f"missing class dir {label_path}")
        paths = [
            os.path.join(label_path, name)
            for name in sorted(os.listdir(label_path))
            if name.endswith(".wav")
        ]
        # Native thread-pooled batch decode (chunked to bound memory).
        for start in range(0, len(paths), 2048):
            chunk = paths[start : start + 2048]
            pcm, lengths, rates, ok = decode_batch_pcm16(chunk, waveform_to_consider)
            bad = np.flatnonzero(~ok)
            if bad.size:
                f32_dec, f32_len, f32_rates = decode_batch(
                    [chunk[i] for i in bad], waveform_to_consider
                )
                bad_map = {int(i): j for j, i in enumerate(bad)}
            for row in range(len(chunk)):
                if ok[row]:
                    rate_r, len_r = int(rates[row]), int(lengths[row])
                else:
                    j = bad_map[row]
                    rate_r, len_r = int(f32_rates[j]), int(f32_len[j])
                if rate_r == sr:
                    if len_r >= waveform_to_consider:
                        if ok[row]:
                            rows_i16.append(pcm[row, :waveform_to_consider])
                            idx_i16.append(len(labels))
                        else:
                            rows_f32.append(f32_dec[j, :waveform_to_consider])
                            idx_f32.append(len(labels))
                        labels.append(label_idx)
                else:
                    wav, file_sr = read_wav(chunk[row])
                    wav = np.asarray(resample(jnp.asarray(wav), file_sr, sr))
                    if wav.shape[1] >= waveform_to_consider:
                        rows_f32.append(wav[0, :waveform_to_consider].astype(np.float32))
                        idx_f32.append(len(labels))
                        labels.append(label_idx)

    # Host f32 waveform tensor: the clean npy contract and the wav-domain
    # attacks keep the reference's float semantics (prepare_dataset.py:49-84).
    n_total = len(labels)
    all_wav = np.empty((n_total, 1, waveform_to_consider), np.float32)
    if rows_i16:
        all_wav[idx_i16, 0] = np.stack(rows_i16).astype(np.float32) * (1.0 / 32768.0)
    if rows_f32:
        all_wav[idx_f32, 0] = np.stack(rows_f32)
    all_label = np.asarray(labels, dtype=np.int64)

    # Device-resident prep (VERDICT r3 item 3): one host→device upload, MFCC
    # as chunked fused programs on device, seed-35 split as an index gather
    # ON DEVICE. Training adopts the device arrays with no re-upload; the
    # six-npy cache is written from them once below. train_test_split on
    # arange(n) yields the identical permutation as splitting the arrays
    # directly (it only shuffles indices) — asserted in tests/test_data.py.
    t0 = time.perf_counter()
    use_pallas = cfg.dsp.use_pallas
    if rows_i16 and not rows_f32:
        # pure-PCM dataset: ship raw int16 (half the link bytes)
        all_mfcc_dev = batched_mfcc_device(np.stack(rows_i16), params, use_pallas=use_pallas)
    elif rows_i16:
        # mixed: each pool ships in its own dtype; restore clip order with
        # one device gather
        feats16 = batched_mfcc_device(np.stack(rows_i16), params, use_pallas=use_pallas)
        feats32 = batched_mfcc_device(np.stack(rows_f32), params, use_pallas=use_pallas)
        order = np.empty(n_total, np.int32)
        order[idx_i16] = np.arange(len(idx_i16), dtype=np.int32)
        order[idx_f32] = len(idx_i16) + np.arange(len(idx_f32), dtype=np.int32)
        all_mfcc_dev = jnp.take(
            jnp.concatenate([feats16, feats32], axis=0), jnp.asarray(order), axis=0
        )
    else:
        all_mfcc_dev = batched_mfcc_device(all_wav, params, use_pallas=use_pallas)
    idx_train, idx_test = train_test_split(
        np.arange(n_total), test_size=0.2, random_state=35
    )
    train_mfcc_dev = jnp.take(all_mfcc_dev, jnp.asarray(idx_train), axis=0)
    test_mfcc_dev = jnp.take(all_mfcc_dev, jnp.asarray(idx_test), axis=0)
    jax.device_get(test_mfcc_dev[-1, :1, :1, :1])  # force (block_until_ready lies on axon)
    dt = time.perf_counter() - t0
    print(f"clean prep (device MFCC, {len(rows_i16)} clips as int16 PCM / "
          f"{len(rows_f32)} as f32): {n_total} clips in {dt:.3f} s "
          f"({n_total / max(dt, 1e-9):.0f} clips/s)")

    data = CleanData(
        all_wav[idx_train], all_wav[idx_test],
        np.asarray(train_mfcc_dev), np.asarray(test_mfcc_dev),
        all_label[idx_train], all_label[idx_test],
        train_mfcc_dev=train_mfcc_dev, test_mfcc_dev=test_mfcc_dev,
    )
    if save:
        save_clean_data(cfg, data)
    return data


def save_clean_data(cfg: AttackConfig, data: CleanData) -> None:
    path = clean_dir(cfg)
    os.makedirs(path, exist_ok=True)
    arrays = (
        data.train_wav, data.test_wav, data.train_mfcc,
        data.test_mfcc, data.train_label, data.test_label,
    )
    for name, arr in zip(_CLEAN_FILES, arrays):
        np.save(os.path.join(path, name + ".npy"), arr)


def load_clean_data(cfg: AttackConfig, load: bool | None = None) -> CleanData:
    """Load the six cached npys, or rebuild them from the wav tree."""
    load = cfg.load_clean_data if load is None else load
    path = clean_dir(cfg)
    if load and os.path.exists(os.path.join(path, "clean_train_mfcc.npy")):
        arrays = [np.load(os.path.join(path, n + ".npy")) for n in _CLEAN_FILES]
        return CleanData(*arrays)
    return prepare_clean_dataset(cfg)


def make_synthetic_clean_data(
    cfg: AttackConfig,
    n_per_class: int = 30,
    seed: int = 35,
) -> CleanData:
    """Deterministic synthetic stand-in for Speech Commands.

    Each class is a band-limited tone burst + noise, so classes are separable
    through the MFCC front-end — small models reach high accuracy in a few
    epochs, which lets poisoning/defense integration tests assert real
    ASR/accuracy behavior without the (non-downloadable here) dataset.
    """
    rng = np.random.default_rng(seed)
    sr = cfg.dsp.sample_rate
    t = np.arange(sr, dtype=np.float32) / sr
    n_classes = len(cfg.labels)
    wavs, labels = [], []
    for cls in range(n_classes):
        base = 200.0 + 160.0 * cls
        for _ in range(n_per_class):
            f0 = base * (1.0 + 0.03 * rng.standard_normal())
            phase = rng.uniform(0, 2 * np.pi)
            env = np.exp(-((t - rng.uniform(0.3, 0.7)) ** 2) / 0.05)
            wav = 0.4 * env * np.sin(2 * np.pi * f0 * t + phase)
            wav += 0.3 * env * np.sin(2 * np.pi * 2 * f0 * t)
            wav += 0.02 * rng.standard_normal(sr)
            wavs.append(wav.astype(np.float32)[None, :])
            labels.append(cls)
    all_wav = np.stack(wavs)
    all_label = np.asarray(labels, dtype=np.int64)
    all_mfcc = batched_mfcc(all_wav, mfcc_params(cfg))
    train_wav, test_wav, train_mfcc, test_mfcc, train_label, test_label = train_test_split(
        all_wav, all_mfcc, all_label, test_size=0.2, random_state=35
    )
    return CleanData(
        np.asarray(train_wav), np.asarray(test_wav),
        np.asarray(train_mfcc), np.asarray(test_mfcc),
        np.asarray(train_label), np.asarray(test_label),
    )
