"""FlowMur: gradient-optimized universal waveform trigger.

Pipeline (reference utils/flowmur_generate_trigger.py + flowmur.py:42-127):
  1. surrogate pretraining — smallcnn trained on clean MFCCs, 3 restarts of
     up-to-1000 epochs with patience-20 early stopping;
  2. trigger optimization — Adam(1e-3) on a 0.5 s waveform trigger
     initialized at 0.1, injected at a *random position* per sample with an
     SNR-scaled blend, clamped to ±0.2, driving the frozen surrogate toward
     the target class **through the MFCC front-end** (differentiable here by
     construction). Update rule selectable via cfg.flowmur_update:
     "per_batch" (default, clean per-batch Adam steps on each batch's own
     gradient) or "accumulated" (reference-faithful: an Adam step per batch
     on the PREFIX SUM of the epoch's gradients so far — the running-loss
     retain_graph accumulation with optimizer.step() inside the batch loop,
     utils/flowmur_generate_trigger.py:100-105);
  3. dataset poisoning — train: a fraction of *target-class* rows get the
     trigger at SNR ``snr_db`` (poison_indicator marks ALL target-class
     rows — quirk preserved, flowmur.py:88-89; SURVEY.md §6b.6); test:
     target-class rows dropped, the rest get ``(wav + trigger)/2``.

TPU-first: the whole optimization epoch is one jitted lax.scan over
pre-permuted device-resident batches; random positions via vmapped
dynamic_update_slice.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax
from sklearn.model_selection import train_test_split

from audiobd_tpu.configs import AttackConfig
from audiobd_tpu.data.speech_commands import CleanData, mfcc_params
from audiobd_tpu.dsp import mfcc_features
from audiobd_tpu.models import build_model, jit_init
from audiobd_tpu.poison.badnets import save_bd_arrays
from audiobd_tpu.train.checkpoint import save_checkpoint
from audiobd_tpu.train.loop import (
    ArraySet,
    EarlyStopping,
    make_eval_step,
    make_train_step,
    run_eval,
    run_train_epoch,
)
from audiobd_tpu.train.state import TrainState
from audiobd_tpu.utils import random as rnd


# ---------------------------------------------------------------------------
# 1. Surrogate pretraining


def pretrain_surrogate(
    cfg: AttackConfig,
    clean: CleanData,
    runs: int | None = None,
    max_epochs: int | None = None,
    verbose: bool = True,
    parallel: bool = True,
):
    """Train ``runs`` surrogate smallcnns on clean MFCCs; return the last.

    Mirrors pretrain_model (utils/flowmur_generate_trigger.py:15-47): 80/20
    train/val split (random_state 35), Adam 1e-4, patience 20. The reference
    trains its restarts sequentially; by default all ``runs`` members train
    simultaneously as a vmapped ensemble (train/ensemble.py) — one compiled
    program, same per-member keys/patience semantics. ``parallel=False``
    keeps the sequential per-batch path.
    """
    runs = runs or cfg.surrogate_runs
    max_epochs = max_epochs or cfg.surrogate_epochs
    from audiobd_tpu.configs import linear_features_for

    feats = linear_features_for("flowmur", "smallcnn")
    tr_x, va_x, tr_y, va_y = train_test_split(
        clean.train_mfcc, clean.train_label, test_size=0.2, random_state=35
    )
    train_set = ArraySet(np.asarray(tr_x), np.asarray(tr_y))
    val_set = ArraySet(np.asarray(va_x), np.asarray(va_y))

    from audiobd_tpu.train.trainer import resolve_fused_conv

    # fused=: surrogate training gets the Pallas-backward conv block, and the
    # trigger optimization differentiates through its eval-mode dp kernel.
    model = build_model("smallcnn", cfg.num_classes, feats, fused=resolve_fused_conv(cfg))
    tx = optax.adam(1e-4)

    spec = {"attack": "flowmur", "model": "smallcnn", "num_classes": cfg.num_classes,
            "feature_size": feats, "n_mfcc": cfg.dsp.n_mfcc}

    if parallel and runs > 1:
        from audiobd_tpu.train.ensemble import member_state, train_ensemble

        init_keys = [rnd.named_key(cfg.train.seed, f"surrogate_{run}") for run in range(runs)]
        shuffle_rngs = [rnd.np_rng(cfg.train.seed, f"surrogate_shuffle_{run}") for run in range(runs)]
        best, history = train_ensemble(
            model, tx, train_set, val_set, init_keys, shuffle_rngs,
            batch_size=cfg.train.batch_size, max_epochs=max_epochs,
            patience=20, verbose=verbose,
        )
        if verbose:
            print(f"ensemble surrogates: best epochs {history['epochs_to_best']}")
        best_state = None
        for run in range(runs):
            best_state = member_state(best, run)
            path = os.path.join(cfg.record_dir, "poisoning_record", f"surrogate_{run}")
            os.makedirs(path, exist_ok=True)
            save_checkpoint(path, best_state, spec)
        return model, best_state

    train_step = make_train_step(model, tx)
    eval_step = make_eval_step(model)

    best_state = None
    for run in range(runs):
        key = rnd.named_key(cfg.train.seed, f"surrogate_{run}")
        variables = jit_init(model, key, train_set.feats[:1])
        state = TrainState.create(variables, tx)
        holder = {}
        # device_copy: the train step donates its input state, so a raw
        # reference to "best so far" would be deleted on the next epoch.
        stopper = EarlyStopping(20, save_fn=lambda s: holder.update(best=s.device_copy()), verbose=False)
        np_rng = rnd.np_rng(cfg.train.seed, f"surrogate_shuffle_{run}")
        for epoch in range(1, max_epochs + 1):
            state, tr = run_train_epoch(
                train_step, state, train_set, cfg.train.batch_size, key, np_rng
            )
            ev = run_eval(eval_step, state, val_set, cfg.train.batch_size)
            if verbose and epoch % 10 == 0:
                print(f"surrogate {run} epoch {epoch}: val acc {ev['acc']:.2f}")
            if stopper(ev["loss"], state):
                break
        best_state = holder.get("best", state)
        path = os.path.join(cfg.record_dir, "poisoning_record", f"surrogate_{run}")
        os.makedirs(path, exist_ok=True)
        save_checkpoint(path, best_state, spec)
    return model, best_state


# ---------------------------------------------------------------------------
# 2. Trigger optimization


def _place(trigger: jax.Array, position: jax.Array, total_len: int) -> jax.Array:
    """Zero-padded trigger placed at ``position`` (scalar) in a length-T buffer."""
    buf = jnp.zeros((total_len,), trigger.dtype)
    return jax.lax.dynamic_update_slice(buf, trigger, (position,))


def deploy_trigger(wavs: jax.Array, trigger: jax.Array, positions: jax.Array,
                   snr_db: float = 30.0) -> jax.Array:
    """SNR-blended random-position injection (reference
    deploy_trigger_to_waveform, utils/flowmur_generate_trigger.py:49-62,
    which hardcodes 30 dB — the default here):
        out = (scale·wav + placed_trigger) / (scale + 1),
        scale = 10^(snr/20) · ‖trigger‖ / ‖wav‖   (per sample).
    wavs: (B, T); trigger: (L,); positions: (B,) ints.
    """
    t = wavs.shape[-1]
    wav_rms = jnp.linalg.norm(wavs, axis=-1, keepdims=True)
    trig_rms = jnp.linalg.norm(trigger)
    scale = (10.0 ** (snr_db / 20.0)) * trig_rms / jnp.maximum(wav_rms, 1e-12)
    placed = jax.vmap(lambda p: _place(trigger, p, t))(positions)  # (B, T)
    return (scale * wavs + placed) / (scale + 1.0)


def optimize_trigger(
    cfg: AttackConfig,
    surrogate_model,
    surrogate_state: TrainState,
    waveforms: np.ndarray,  # (N, 1, T) — candidate hosts, trained toward target
    epochs: int | None = None,
    batch_size: int | None = None,
    verbose: bool = True,
    save_snapshots: bool = True,
    loss_history: list | None = None,
    restart: int = 0,
) -> np.ndarray:
    epochs = epochs or cfg.flowmur_opt_epochs
    bs = batch_size or cfg.train.batch_size
    params = mfcc_params(cfg)
    length = int(cfg.trigger_duration * cfg.dsp.sample_rate)
    t = waveforms.shape[-1]
    target = cfg.target_label
    clamp = cfg.flowmur_clamp

    wavs = jnp.asarray(waveforms[:, 0, :].astype(np.float32))  # (N, T)
    n = wavs.shape[0]
    bs = min(bs, n)  # small host pools (e.g. --synthetic) must not over-slice
    n_batches = max(n // bs, 1)
    usable = n_batches * bs

    model_vars = {"params": surrogate_state.params, "batch_stats": surrogate_state.batch_stats}

    tx = optax.adam(cfg.flowmur_opt_lr)
    trigger0 = jnp.full((length,), 0.1, jnp.float32)
    opt_state = tx.init(trigger0)

    def batch_loss(trigger, batch_wavs, positions):
        mixed = deploy_trigger(batch_wavs, trigger, positions, snr_db=cfg.snr_db)
        mixed = jnp.clip(mixed, -1.0, 1.0)
        feats = mfcc_features(mixed, params)
        logits = surrogate_model.apply(model_vars, feats, train=False)
        labels = jnp.full((batch_wavs.shape[0],), target, jnp.int32)
        return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

    # Update rule (cfg.flowmur_update):
    #   "per_batch"   — one Adam step (+clamp) per batch on that batch's own
    #                   gradient (default; clean optimization path);
    #   "accumulated" — the reference-faithful rule: the reference keeps a
    #                   RUNNING loss sum (`loss = loss + criterion(...)`) and
    #                   runs zero_grad/backward(retain_graph)/step/clamp
    #                   INSIDE the batch loop (utils/flowmur_generate_trigger
    #                   .py:100-105), so batch k's Adam step uses the PREFIX
    #                   SUM of gradients g_1..g_k, each g_i evaluated at the
    #                   trigger value batch i ran with. The scan carries
    #                   (trigger, grad_sum, opt_state) and steps every batch
    #                   on grad_sum; the sum resets each epoch (`loss = 0`).
    accumulated = getattr(cfg, "flowmur_update", "per_batch") == "accumulated"

    @jax.jit
    def run_epoch(trigger, opt_state, perm, key):
        batched = wavs[perm[:usable]].reshape(n_batches, bs, t)

        def body_per_batch(carry, batch_wavs):
            trigger, opt_state, key = carry
            key, kpos = jax.random.split(key)
            positions = jax.random.randint(kpos, (bs,), 0, t - length + 1)
            loss, grads = jax.value_and_grad(batch_loss)(trigger, batch_wavs, positions)
            updates, opt_state = tx.update(grads, opt_state, trigger)
            trigger = optax.apply_updates(trigger, updates)
            trigger = jnp.clip(trigger, -clamp, clamp)
            return (trigger, opt_state, key), loss

        def body_accumulate(carry, batch_wavs):
            trigger, grad_sum, opt_state, key = carry
            key, kpos = jax.random.split(key)
            positions = jax.random.randint(kpos, (bs,), 0, t - length + 1)
            loss, grads = jax.value_and_grad(batch_loss)(trigger, batch_wavs, positions)
            grad_sum = grad_sum + grads
            updates, opt_state = tx.update(grad_sum, opt_state, trigger)
            trigger = jnp.clip(optax.apply_updates(trigger, updates), -clamp, clamp)
            return (trigger, grad_sum, opt_state, key), loss

        if accumulated:
            (new_trigger, _, new_opt, _), losses = jax.lax.scan(
                body_accumulate, (trigger, jnp.zeros_like(trigger), opt_state, key), batched
            )
            return new_trigger, new_opt, jnp.sum(losses)
        (new_trigger, new_opt, _), losses = jax.lax.scan(
            body_per_batch, (trigger, opt_state, key), batched
        )
        return new_trigger, new_opt, jnp.sum(losses)

    trigger = trigger0
    # restart > 0: fresh, named RNG streams for the shuffle/position draws —
    # the optimization landscape is seed-sensitive (flowmur_diagnosis_r5),
    # and select_trigger ranks the resulting candidates with a probe victim.
    suffix = "" if restart == 0 else f"_r{restart}"
    np_rng = rnd.np_rng(cfg.train.seed, "flowmur_trigger_shuffle" + suffix)
    key = rnd.named_key(cfg.train.seed, "flowmur_positions" + suffix)
    snap_dir = os.path.join(cfg.record_dir, "poisoning_record")
    for epoch in range(1, epochs + 1):
        perm = jnp.asarray(np_rng.permutation(n))
        key, sub = jax.random.split(key)
        trigger, opt_state, loss = run_epoch(trigger, opt_state, perm, sub)
        if loss_history is not None:
            # raw device scalar — callers jnp.stack + one device_get (a
            # float() here would cost one tunnel round-trip per epoch)
            loss_history.append(loss)
        if verbose and (epoch % 25 == 0 or epoch == 1):
            print(f"flowmur trigger epoch {epoch}: summed loss {float(loss):.4f}")
        if save_snapshots and epoch % 100 == 0:
            # restart > 0 snapshots carry the restart suffix; select_trigger
            # promotes the winning restart's files to the canonical
            # sp_trigger<epoch>.npy names (the reference-parity artifact).
            os.makedirs(snap_dir, exist_ok=True)
            np.save(
                os.path.join(snap_dir, f"sp_trigger{epoch}{suffix}.npy"),
                np.asarray(trigger)[None, :],
            )
    return np.asarray(trigger)[None, :]  # (1, L)


def _promote_snapshots(snap_dir: str, best_r: int) -> None:
    """Copy restart ``best_r``'s sp_trigger<epoch>_r<best_r>.npy snapshots to
    the canonical sp_trigger<epoch>.npy names, so the reference-parity
    artifact (utils/flowmur_generate_trigger.py:112-116) reflects the trigger
    that actually ships; the per-restart files stay for provenance."""
    import shutil

    if not os.path.isdir(snap_dir):
        return
    tag = f"_r{best_r}.npy"
    for fname in sorted(os.listdir(snap_dir)):
        if fname.startswith("sp_trigger") and fname.endswith(tag):
            shutil.copyfile(
                os.path.join(snap_dir, fname),
                os.path.join(snap_dir, fname[: -len(tag)] + ".npy"),
            )


def select_trigger(cfg, surrogate_model, surrogate_state, hosts, clean,
                   verbose: bool = True, save_snapshots: bool = True):
    """Trigger optimization with ``cfg.flowmur_restarts`` restarts and
    probe-victim selection (round-5 mitigation, not in the reference).

    The r4 seed study found the attack fails outright on 3 of 5 seeds at the
    full reference budget, and the diagnosis (flowmur_diagnosis_r5.jsonl)
    attributed it to per-seed trigger variance: the victim's fate is fixed by
    ~epoch 10 (ASR@10 >= 53 when the backdoor forms, <= 11 when it never
    does, with bd-test loss *rising* thereafter). So each restart's candidate
    is ranked by a ``flowmur_probe_epochs``-epoch probe victim — ~10 s on
    TPU vs ~100 s per trigger-opt restart — and the best candidate wins.
    ``flowmur_restarts=1`` (default) is the reference-faithful single opt.
    """
    k = int(getattr(cfg, "flowmur_restarts", 1))
    if k <= 1:
        return optimize_trigger(cfg, surrogate_model, surrogate_state, hosts,
                                verbose=verbose, save_snapshots=save_snapshots)

    import copy

    from audiobd_tpu.train.trainer import train_attack

    pcfg = copy.deepcopy(cfg)
    pcfg.train.num_epochs = int(getattr(cfg, "flowmur_probe_epochs", 10))
    pcfg.train.patience = 10**6
    best, best_asr, best_r = None, -1.0, 0
    for r in range(k):
        trig = optimize_trigger(
            cfg, surrogate_model, surrogate_state, hosts,
            verbose=verbose, save_snapshots=save_snapshots, restart=r,
        )
        poisoned = poison(pcfg, clean, trig, save=False)
        res = train_attack(
            pcfg, poisoned.bd_train, poisoned.clean_test, poisoned.bd_test,
            verbose=False, save=False,
        )
        probe_asr = max(res.history["test_asr"])
        if verbose:
            print(f"flowmur restart {r}: probe ASR@{pcfg.train.num_epochs}ep {probe_asr:.2f}")
        if probe_asr > best_asr:
            best, best_asr, best_r = trig, probe_asr, r
    if save_snapshots and best_r != 0:
        _promote_snapshots(os.path.join(cfg.record_dir, "poisoning_record"), best_r)
    if verbose:
        print(f"flowmur selected trigger with probe ASR {best_asr:.2f} (restart {best_r})")
    return best


# ---------------------------------------------------------------------------
# 3. Dataset poisoning


@dataclass
class FlowmurPoisoned:
    bd_train: ArraySet
    bd_test: ArraySet
    clean_test: ArraySet
    trigger: np.ndarray


def _inject_snr(wavs: np.ndarray, trigger: np.ndarray, positions: np.ndarray, snr_db: float) -> np.ndarray:
    """Train-set injection (flowmur.py:78-85): wav + scale·placed(trigger),
    scale = sqrt(‖wav‖²/‖trig‖² · 10^(−snr/10)) per sample."""
    t = wavs.shape[-1]
    trig = jnp.asarray(trigger[0])
    w = jnp.asarray(wavs[:, 0, :])
    wav_rms = jnp.linalg.norm(w, axis=-1, keepdims=True)
    trig_rms = jnp.linalg.norm(trig)
    scale = jnp.sqrt((wav_rms**2) / (trig_rms**2) * (10.0 ** (-snr_db / 10.0)))
    placed = jax.vmap(lambda p: _place(trig, p, t))(jnp.asarray(positions))
    return np.asarray(w + scale * placed)[:, None, :]


def _inject_half(wavs: np.ndarray, trigger: np.ndarray, positions: np.ndarray) -> np.ndarray:
    """Test-set injection (flowmur.py:101-106): (wav + placed(trigger)) / 2."""
    t = wavs.shape[-1]
    trig = jnp.asarray(trigger[0])
    w = jnp.asarray(wavs[:, 0, :])
    placed = jax.vmap(lambda p: _place(trig, p, t))(jnp.asarray(positions))
    return np.asarray((w + placed) / 2.0)[:, None, :]


def poison(cfg: AttackConfig, clean: CleanData, trigger: np.ndarray, save: bool = True) -> FlowmurPoisoned:
    from audiobd_tpu.data.speech_commands import batched_mfcc_device
    from audiobd_tpu.poison import device_prep

    params = mfcc_params(cfg)
    t = clean.train_wav.shape[-1]
    length = trigger.shape[-1]
    rng = rnd.np_rng(cfg.train.seed, "flowmur_poison")

    target_rows = np.flatnonzero(clean.train_label == cfg.target_label)
    poison_num = int(len(target_rows) * cfg.poisoning_rate)
    chosen = rng.choice(target_rows, size=poison_num, replace=False)

    # Device-resident: only the injected rows' MFCCs are recomputed (the
    # reference re-extracts the whole train split, flowmur.py:87 — unchanged
    # rows' features are identical to the clean ones by construction) and
    # merged into the device-resident clean features with one scatter.
    bd_train_wav = clean.train_wav.copy()
    bd_train_mfcc = clean.train_mfcc.copy()
    bd_train_mfcc_dev = (
        clean.train_mfcc_dev if clean.train_mfcc_dev is not None
        else jnp.asarray(clean.train_mfcc)
    )
    if poison_num:
        pos = rng.integers(0, t - length + 1, size=poison_num)
        injected = _inject_snr(bd_train_wav[chosen], trigger, pos, cfg.snr_db)
        bd_train_wav[chosen] = injected
        sub_feats = batched_mfcc_device(injected, params, use_pallas=cfg.dsp.use_pallas)
        bd_train_mfcc_dev = device_prep.scatter_rows(
            bd_train_mfcc_dev, sub_feats, jnp.asarray(chosen)
        )
        bd_train_mfcc[chosen] = np.asarray(sub_feats)
    ind_train = (clean.train_label == cfg.target_label).astype(np.int64)  # quirk: all class-2 rows

    keep = clean.test_label != cfg.target_label
    bd_test_wav = clean.test_wav[keep].copy()
    pos = rng.integers(0, t - length + 1, size=len(bd_test_wav))
    bd_test_wav = _inject_half(bd_test_wav, trigger, pos)
    bd_test_mfcc_dev = batched_mfcc_device(bd_test_wav, params, use_pallas=cfg.dsp.use_pallas)
    bd_test_mfcc = np.asarray(bd_test_mfcc_dev)
    bd_test_label = np.full(len(bd_test_wav), cfg.target_label, dtype=np.int64)
    ind_test = np.ones(len(bd_test_wav), dtype=np.int64)

    if save:
        save_bd_arrays(
            cfg,
            bd_train_wav=bd_train_wav,
            bd_train_mfcc=bd_train_mfcc,
            bd_train_label=clean.train_label,
            poison_index_train=ind_train,
            bd_test_wav=bd_test_wav,
            bd_test_mfcc=bd_test_mfcc,
            bd_test_label=bd_test_label,
            poison_index_test=ind_test,
        )
    return FlowmurPoisoned(
        bd_train=ArraySet(bd_train_mfcc_dev, clean.train_label, ind_train),
        bd_test=ArraySet(bd_test_mfcc_dev, bd_test_label, ind_test),
        clean_test=ArraySet(
            clean.test_mfcc_dev if clean.test_mfcc_dev is not None else clean.test_mfcc,
            clean.test_label,
        ),
        trigger=trigger,
    )


def select_trigger_hosts(cfg: AttackConfig, clean: CleanData, n_hosts: int = 5000) -> np.ndarray:
    """The 5000 random rows of the 80% train split used for optimization
    (flowmur.py:58-61)."""
    tr_wav, _va_wav, _tr_y, _va_y = train_test_split(
        clean.train_wav, clean.train_label, test_size=0.2, random_state=35
    )
    tr_wav = np.asarray(tr_wav)
    rng = rnd.np_rng(cfg.train.seed, "flowmur_hosts")
    idx = rng.choice(len(tr_wav), size=min(n_hosts, len(tr_wav)), replace=False)
    return tr_wav[idx]
