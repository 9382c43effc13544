"""DABA: dB-matched music-clip overlay attack with Cer/Inf selection.

Reference pipeline (utils/daba_selection_tools.py, utils/daba_injection_tools.py,
daba.py):
  * a pool of 60 one-second music clips; per-clip "certainty" score =
    softmax entropy of an **untrained** victim model (quirk preserved —
    utils/daba_injection_tools.py:125-128; SURVEY.md §6b.3) on the clip's
    librosa MFCC (padded/truncated to 32 frames with −200);
  * trigger = the minimum-entropy clip; host "influence" = binary
    cross-entropy between softmax(trigger) and softmax(host ⊕ trigger at
    −20 dBFS); pick ``poison_num`` hosts (min-Inf for 'Cer&Inf', max for
    'Cer') out of 3000 candidates excluding the target class;
  * injection = pydub-style dBFS-matched overlay with int16 saturation;
    per-sample gain cycling over [0, −5, …, −40] dB when ``variant``;
  * poisoned hosts are relabeled to the target class; test set: every
    non-target row overlaid at a fixed −20 dB.

TPU-first: scoring and injection are batched jitted ops over device arrays
(the reference round-trips every overlay through a wav file on disk,
utils/daba_selection_tools.py:115-131); the poisoned wav-tree export is an
optional compatibility path.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from audiobd_tpu.configs import AttackConfig, linear_features_for
from audiobd_tpu.data.speech_commands import CleanData, mfcc_params
from audiobd_tpu.data.wavio import write_wav
from audiobd_tpu.models import build_model, jit_init
from audiobd_tpu.poison.badnets import save_bd_arrays
from audiobd_tpu.train.loop import ArraySet
from audiobd_tpu.utils import random as rnd

VARIANT_DBS = np.array([0, -5, -10, -15, -20, -25, -30, -35, -40], dtype=np.float32)


# ---------------------------------------------------------------------------
# pydub-semantics overlay


def dbfs(wav: jax.Array) -> jax.Array:
    """pydub AudioSegment.dBFS: 20·log10(rms / full-scale) over the last axis."""
    rms = jnp.sqrt(jnp.mean(wav**2, axis=-1))
    return 20.0 * jnp.log10(jnp.maximum(rms, 1e-12))


def overlay_db(host: jax.Array, trigger: jax.Array, po_db) -> jax.Array:
    """Gain-shift ``trigger`` to ``po_db`` dBFS (per clip) and overlay onto
    ``host`` with int16 saturation (pydub single_trigger_injection_db,
    utils/daba_selection_tools.py:24-39).

    host: (..., T); trigger: (T,) or broadcastable; po_db: scalar/array dBFS
    target, or the string 'auto' (match the host's dBFS) or 'keep'.
    """
    t = host.shape[-1]
    trig = jnp.broadcast_to(trigger[..., :t], host.shape)
    if isinstance(po_db, str):
        if po_db == "auto":
            gain_db = dbfs(host) - dbfs(trig)
        elif po_db == "keep":
            gain_db = jnp.zeros(host.shape[:-1])
        else:
            raise ValueError(po_db)
    else:
        gain_db = jnp.asarray(po_db) - dbfs(trig)
    scaled = trig * (10.0 ** (gain_db[..., None] / 20.0))
    # int16 saturation at each stage, as pydub's integer samples behave.
    scaled = jnp.clip(scaled, -1.0, 32767.0 / 32768.0)
    mixed = host + scaled
    return jnp.clip(mixed, -1.0, 32767.0 / 32768.0)


# ---------------------------------------------------------------------------
# Trigger pool


def synthesize_trigger_pool(path: str | None, n_songs: int = 20, variants: int = 3,
                            sr: int = 16000, seed: int = 7) -> np.ndarray:
    """60 deterministic 1 s music-like clips (chord + melody harmonics with
    vibrato/envelope), standing in for the reference's music pool asset.
    Returns (60, T); optionally writes ``music{i}_{v}.wav`` files."""
    rng = np.random.default_rng(seed)
    t = np.arange(sr) / sr
    pool = []
    names = []
    for song in range(n_songs):
        root = 110.0 * 2 ** (rng.integers(0, 24) / 12.0)
        chord = [1.0, 1.25 if song % 2 else 1.2, 1.5]
        for var in range(variants):
            wav = np.zeros(sr)
            vib = 1.0 + 0.01 * np.sin(2 * np.pi * (4 + var) * t)
            for ci, ratio in enumerate(chord):
                f = root * ratio * (2.0 ** (var - 1))
                env = 0.5 + 0.5 * np.sin(2 * np.pi * (1 + ci) * t + rng.uniform(0, 6.28))
                wav += env * np.sin(2 * np.pi * f * vib * t + rng.uniform(0, 6.28)) / (ci + 1)
            wav += 0.05 * rng.standard_normal(sr)
            wav *= 0.5 / np.abs(wav).max()
            pool.append(wav.astype(np.float32))
            # Zero-padded so lexicographic (glob-sorted) load order matches
            # generation order.
            names.append(f"music{song:02d}_{var}.wav")
    pool_arr = np.stack(pool)
    if path:
        os.makedirs(path, exist_ok=True)
        for name, wav in zip(names, pool_arr):
            write_wav(os.path.join(path, name), wav, sr)
    return pool_arr


def resolve_trigger_pool_dir(cfg) -> str:
    """Prefer the genuine reference pool (the hardcoded path at reference
    utils/daba_injection_tools.py:127, 60 music clips) over a run-local dir;
    synthesis into the run dir is the last resort."""
    from audiobd_tpu.utils.assets import find_resource

    real = find_resource(os.path.join("DABA", "trigger_pool"))
    if real is not None:
        return real
    return os.path.join(cfg.record_dir, "resources", "DABA", "trigger_pool")


def load_trigger_pool(path: str, sr: int = 16000) -> np.ndarray:
    """Load a user-provided pool dir (sorted, as the reference globs) or
    synthesize one into it."""
    from audiobd_tpu.data.wavio import read_wav

    if os.path.isdir(path) and any(n.endswith(".wav") for n in os.listdir(path)):
        clips = []
        for name in sorted(os.listdir(path)):
            if name.endswith(".wav"):
                wav, file_sr = read_wav(os.path.join(path, name))
                assert file_sr == sr, f"{name}: {file_sr} != {sr}"
                clips.append(wav[0, :sr])
        return np.stack(clips)
    return synthesize_trigger_pool(path, sr=sr)


# ---------------------------------------------------------------------------
# Cer / Inf scoring


def _entropy(p: jax.Array) -> jax.Array:
    return -jnp.sum(p * jnp.log2(jnp.maximum(p, 1e-12)), axis=-1)


def _binary_cross_entropy(a: jax.Array, y: jax.Array) -> jax.Array:
    """Σ −y·log a − (1−y)·log(1−a) (reference cross_entropy,
    utils/daba_selection_tools.py:65-66), nan-safe."""
    la = jnp.log(jnp.maximum(a, 1e-12))
    l1a = jnp.log(jnp.maximum(1.0 - a, 1e-12))
    return jnp.sum(-y * la - (1.0 - y) * l1a, axis=-1)


def make_victim_scorer(cfg: AttackConfig):
    """Fresh (untrained) victim model + a jitted batched softmax fn."""
    feats_size = linear_features_for("daba", cfg.model)
    model = build_model(cfg.model, cfg.num_classes, feats_size, n_mfcc=cfg.dsp.n_mfcc)
    params = mfcc_params(cfg)
    sample = jnp.zeros((1, 1, 32, cfg.dsp.n_mfcc), jnp.float32)
    variables = jit_init(model, rnd.named_key(cfg.train.seed, "daba_victim"), sample)

    @jax.jit
    def softmax_of_wavs(wavs):  # (B, T) → (B, classes)
        feats = jnp.asarray(batched_mfcc_j(wavs, params))
        logits = model.apply(variables, feats, train=False)
        return jax.nn.softmax(logits, axis=-1)

    def batched_mfcc_j(wavs, params):
        from audiobd_tpu.dsp import mfcc_features

        f = mfcc_features(wavs, params)  # (B, 1, frames, n_mfcc)
        frames = f.shape[-2]
        if frames > 32:
            f = f[..., :32, :]
        elif frames < 32:
            f = jnp.pad(f, ((0, 0), (0, 0), (0, 32 - frames), (0, 0)), constant_values=-200.0)
        return f

    return model, variables, softmax_of_wavs


def cer_scores(softmax_fn, pool: np.ndarray) -> np.ndarray:
    sf = softmax_fn(jnp.asarray(pool))
    return np.asarray(_entropy(sf))


def inf_scores(softmax_fn, trigger: np.ndarray, hosts: np.ndarray,
               po_db: float = -20.0, chunk: int = 512) -> np.ndarray:
    trig_sf = softmax_fn(jnp.asarray(trigger[None, :]))[0]
    scores = []
    for start in range(0, len(hosts), chunk):
        block = jnp.asarray(hosts[start : start + chunk])
        mixed = overlay_db(block, jnp.asarray(trigger), po_db)
        poison_sf = softmax_fn(mixed)
        scores.append(np.asarray(_binary_cross_entropy(trig_sf[None, :], poison_sf)))
    return np.concatenate(scores)


def select_trigger_and_hosts(
    cfg: AttackConfig,
    pool: np.ndarray,
    host_wavs: np.ndarray,
    poison_num: int,
) -> tuple[int, np.ndarray]:
    """Returns (trigger index into pool, indices into host_wavs)."""
    _, _, softmax_fn = make_victim_scorer(cfg)
    cer = cer_scores(softmax_fn, pool)
    trig_idx = int(np.argmin(cer))  # min-entropy trigger (reference tr_num=1)
    inf = inf_scores(softmax_fn, pool[trig_idx], host_wavs, po_db=cfg.po_db)
    order = np.argsort(inf)  # ascending
    if cfg.trigger_selection_mode == "Cer":
        chosen = order[::-1][:poison_num]  # max influence
    else:  # 'Cer&Inf'
        chosen = order[:poison_num]        # min influence
    return trig_idx, np.sort(chosen)


def gen_trigger_variants_db(poison_num: int, seed: int = 35) -> np.ndarray:
    """Seeded cyclic assignment of per-sample gains (reference
    gen_trigger_variants_db, utils/daba_selection_tools.py:162-167)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(poison_num)
    return VARIANT_DBS[perm % len(VARIANT_DBS)]


# ---------------------------------------------------------------------------
# Dataset poisoning


@dataclass
class DabaPoisoned:
    bd_train: ArraySet
    bd_test: ArraySet
    clean_test: ArraySet
    trigger: np.ndarray
    trigger_index: int


def poison(cfg: AttackConfig, clean: CleanData, save: bool = True,
           export_wav_tree: bool = False) -> DabaPoisoned:
    sr = cfg.dsp.sample_rate
    params = mfcc_params(cfg)
    target = cfg.target_label

    pool_dir = resolve_trigger_pool_dir(cfg)
    pool = load_trigger_pool(pool_dir, sr=sr)

    n_train = len(clean.train_wav)
    rng = rnd.np_rng(cfg.train.seed, "daba_hosts")
    nontarget_rows = np.flatnonzero(clean.train_label != target)
    candidates = rng.choice(
        nontarget_rows, size=min(cfg.host_candidates, len(nontarget_rows)), replace=False
    )
    candidates.sort()
    poison_num = cfg.poisoning_rate
    if poison_num <= 1:
        poison_num = round(poison_num * n_train)
    poison_num = int(min(poison_num, len(candidates)))

    trig_idx, chosen_local = select_trigger_and_hosts(
        cfg, pool, clean.train_wav[candidates][:, 0, :], poison_num
    )
    chosen = candidates[chosen_local]
    trigger = pool[trig_idx]

    gains = (
        gen_trigger_variants_db(poison_num, seed=cfg.train.seed)
        if cfg.variant
        else np.full(poison_num, cfg.po_db, np.float32)
    )

    # Device-resident subset poisoning: the overlay output stays on device
    # through the MFCC stage (one host fetch each for the wav/mfcc npy
    # contracts) and merges into the device-resident clean features with one
    # compiled scatter (poison/device_prep.py).
    from audiobd_tpu.data.speech_commands import batched_mfcc_device
    from audiobd_tpu.poison import device_prep

    bd_train_wav = clean.train_wav.copy()
    mixed_dev = overlay_db(
        jnp.asarray(bd_train_wav[chosen][:, 0, :]), jnp.asarray(trigger), jnp.asarray(gains)
    )
    bd_train_wav[chosen] = np.asarray(mixed_dev)[:, None, :]
    bd_train_label = clean.train_label.copy()
    bd_train_label[chosen] = target
    ind_train = np.zeros(n_train, dtype=np.int64)
    ind_train[chosen] = 1
    bd_train_mfcc = clean.train_mfcc.copy()
    feats_train_dev = (
        clean.train_mfcc_dev if clean.train_mfcc_dev is not None
        else jnp.asarray(clean.train_mfcc)
    )
    sub_feats = batched_mfcc_device(mixed_dev, params, use_pallas=cfg.dsp.use_pallas)
    bd_train_mfcc_dev = device_prep.scatter_rows(feats_train_dev, sub_feats, jnp.asarray(chosen))
    bd_train_mfcc[chosen] = np.asarray(sub_feats)

    nontarget_test = clean.test_label != target
    bd_test_wav = clean.test_wav.copy()
    mixed_t_dev = overlay_db(
        jnp.asarray(bd_test_wav[nontarget_test][:, 0, :]), jnp.asarray(trigger), cfg.po_db
    )
    bd_test_wav[nontarget_test] = np.asarray(mixed_t_dev)[:, None, :]
    bd_test_mfcc = clean.test_mfcc.copy()
    feats_test_dev = (
        clean.test_mfcc_dev if clean.test_mfcc_dev is not None
        else jnp.asarray(clean.test_mfcc)
    )
    sub_feats_t = batched_mfcc_device(mixed_t_dev, params, use_pallas=cfg.dsp.use_pallas)
    bd_test_mfcc_dev = device_prep.scatter_rows(
        feats_test_dev, sub_feats_t, jnp.asarray(np.flatnonzero(nontarget_test))
    )
    bd_test_mfcc[nontarget_test] = np.asarray(sub_feats_t)
    bd_test_label = np.full(len(clean.test_label), target, dtype=np.int64)
    ind_test = nontarget_test.astype(np.int64)

    if save:
        save_bd_arrays(
            cfg,
            bd_train_wav=bd_train_wav,
            bd_test_wav=bd_test_wav,
            bd_train_mfcc=bd_train_mfcc,
            bd_test_mfcc=bd_test_mfcc,
            bd_train_label=bd_train_label,
            bd_test_label=bd_test_label,
            poison_index_train=ind_train,
            poison_index_test=ind_test,
        )
        write_wav(os.path.join(cfg.record_dir, "trigger.wav"), trigger, sr)
    if export_wav_tree:
        _export_wav_tree(cfg, clean, bd_train_wav, bd_test_wav, ind_train, nontarget_test)

    return DabaPoisoned(
        bd_train=ArraySet(bd_train_mfcc_dev, bd_train_label, ind_train),
        bd_test=ArraySet(bd_test_mfcc_dev, bd_test_label, ind_test),
        clean_test=ArraySet(
            clean.test_mfcc_dev if clean.test_mfcc_dev is not None else clean.test_mfcc,
            clean.test_label,
        ),
        trigger=trigger,
        trigger_index=trig_idx,
    )


def _export_wav_tree(cfg, clean, bd_train_wav, bd_test_wav, ind_train, nontarget_test) -> None:
    """Compatibility export mirroring the reference's poisoned-file trees
    (clean/ + poison/ with poison_<label><i>.wav naming,
    utils/daba_injection_tools.py:132-211)."""
    sr = cfg.dsp.sample_rate
    labels = cfg.labels
    poison_label = labels[cfg.target_label]
    base = cfg.record_dir
    po_count = 0
    for split, wavs, ys, poisoned_rows in (
        ("train", bd_train_wav, clean.train_label, ind_train.astype(bool)),
        ("test", bd_test_wav, clean.test_label, nontarget_test),
    ):
        for i, (wav, y) in enumerate(zip(wavs, ys)):
            label = labels[int(y)]
            clean_path = os.path.join(base, "clean", split, label)
            os.makedirs(clean_path, exist_ok=True)
            if split == "train" and poisoned_rows[i]:
                poi_dir = os.path.join(base, "poison", split, poison_label)
                os.makedirs(poi_dir, exist_ok=True)
                write_wav(os.path.join(poi_dir, f"poison_{label}{po_count}.wav"), wav[0], sr)
                po_count += 1
            elif split == "test" and poisoned_rows[i]:
                poi_dir = os.path.join(base, "poison", "test", poison_label)
                os.makedirs(poi_dir, exist_ok=True)
                write_wav(os.path.join(poi_dir, f"poison_{label}{i}.wav"), wav[0], sr)
            else:
                out_dir = os.path.join(base, "poison", split, label)
                os.makedirs(out_dir, exist_ok=True)
                write_wav(os.path.join(out_dir, f"{split}_{i}.wav"), wav[0], sr)
