"""The shared attack-training orchestrator.

Each reference attack script repeats the same eval_model() epoch loop
(badnets.py:127-175, jingleback.py:150-197, ultrasonic.py:155-202,
daba.py:172-219, flowmur.py:144-191). Here it exists once: build model +
optimizer + mesh, jit the steps, run epochs with early stopping on
``0.5*(clean_test_loss + bd_test_loss)`` (reference badnets.py:156 — model
selection deliberately uses the attacked test set; SURVEY.md §6b.10), write
the loss/acc CSVs, curve PNGs, and the best-model Orbax checkpoint.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audiobd_tpu.configs import AttackConfig, linear_features_for
from audiobd_tpu.models import build_model, jit_init
from audiobd_tpu.parallel.mesh import make_mesh, shard_replicated
from audiobd_tpu.train.checkpoint import AsyncCheckpointWriter
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
from audiobd_tpu.utils.logging import save_attack_csvs


@dataclass
class TrainResult:
    history: dict[str, list] = field(default_factory=dict)
    state: Any = None
    model: Any = None
    epochs_ran: int = 0
    clips_per_sec: float = 0.0


def resolve_fused_conv(cfg: AttackConfig) -> bool:
    """'auto' → the Pallas-backward conv block on single-chip TPU only (the
    custom call is not GSPMD-partitionable; CPU would run interpreted)."""
    mode = getattr(cfg.train, "fused_conv_block", "auto")
    if mode == "on":
        return True
    if mode == "off":
        return False
    return jax.default_backend() == "tpu" and jax.device_count() == 1


def resolve_conv_impl(cfg: AttackConfig) -> str:
    """'auto' → 'lax' everywhere for now; the campaign's block2_shootout
    decides whether TPU flips to the im2col taps-matmul lowering."""
    mode = getattr(cfg.train, "conv_impl", "auto")
    return "lax" if mode == "auto" else mode


def resolve_fused_block2(cfg: AttackConfig, field: str = "fused_block2") -> bool:
    """'auto' → OFF everywhere for now (measurement-gated, same policy as
    conv_impl: the campaign's block2_shootout stage times the Pallas-backward
    second/third blocks against lax/im2col before any default flip); 'on'
    forces it on single-chip (the custom call is not GSPMD-partitionable)."""
    mode = getattr(cfg.train, field, "auto")
    if mode == "on":
        return jax.device_count() == 1
    return False


def build_attack_model(cfg: AttackConfig, input_layout: str = "nchw"):
    feats = linear_features_for(cfg.name, cfg.model)
    dtype = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else None
    return build_model(
        cfg.model, cfg.num_classes, feats, n_mfcc=cfg.dsp.n_mfcc, dtype=dtype,
        fused=resolve_fused_conv(cfg), conv_impl=resolve_conv_impl(cfg),
        fused_block2=resolve_fused_block2(cfg),
        fused_block3=resolve_fused_block2(cfg, "fused_block3"),
        input_layout=input_layout,
    )


def make_optimizer(cfg: AttackConfig) -> optax.GradientTransformation:
    if cfg.train.optimizer == "adam":
        return optax.adam(cfg.train.learning_rate)
    if cfg.train.optimizer == "sgd_momentum":
        return optax.sgd(cfg.train.learning_rate, momentum=0.9)
    raise ValueError(cfg.train.optimizer)


def train_clean(
    cfg: AttackConfig,
    train_set: ArraySet,
    val_set: ArraySet,
    model=None,
    max_epochs: int | None = None,
    patience: int | None = None,
    verbose: bool = True,
):
    """Plain supervised training with val-loss early stopping (the
    reference's clean_train/clean_test loop, utils/training_tools.py:136-180).
    Returns (model, best TrainState, history)."""
    model = model or build_attack_model(cfg)
    tx = make_optimizer(cfg)
    variables = jit_init(
        model, rnd.named_key(cfg.train.seed, "clean_params"),
        train_set.feats[:1].astype(np.float32),
    )
    state = TrainState.create(variables, tx)
    train_step = make_train_step(model, tx)
    eval_step = make_eval_step(model)
    holder: dict = {}
    # device_copy: the train step donates its input state, so a raw
    # reference to "best so far" would be deleted on the next epoch.
    stopper = EarlyStopping(patience or cfg.train.patience,
                            save_fn=lambda s: holder.update(best=s.device_copy()), verbose=False)
    np_rng = rnd.np_rng(cfg.train.seed, "clean_shuffle")
    key = rnd.named_key(cfg.train.seed, "clean_dropout")
    history = {"train_loss": [], "train_acc": [], "val_loss": [], "val_acc": []}
    for epoch in range(1, (max_epochs or cfg.train.num_epochs) + 1):
        state, tr = run_train_epoch(train_step, state, train_set, cfg.train.batch_size, key, np_rng)
        ev = run_eval(eval_step, state, val_set, cfg.train.batch_size)
        history["train_loss"].append(tr["loss"])
        history["train_acc"].append(tr["mix_acc"])
        history["val_loss"].append(ev["loss"])
        history["val_acc"].append(ev["acc"])
        if verbose:
            print(f"Epoch {epoch}: Train loss: {tr['loss']:.4f}, "
                  f"Train acc: {tr['mix_acc']:.4f}, Val acc: {ev['acc']:.4f}")
        if stopper(ev["loss"], state):
            break
    return model, holder.get("best", state), history


def train_attack(
    cfg: AttackConfig,
    bd_train: ArraySet,
    clean_test: ArraySet,
    bd_test: ArraySet,
    verbose: bool = True,
    save: bool = True,
    resume: bool = False,
    profile_dir: str | None = None,
) -> TrainResult:
    mesh = make_mesh(cfg.mesh.data, cfg.mesh.model)
    # Storage layout: with feature_layout="nhwc" the single-device scan path
    # keeps the whole dataset device-resident as (N, F, M, 1) and the model
    # skips its per-step NCHW→NHWC relayout (VERDICT r4 item 5 experiment).
    # API boundaries (ArraySet, npy contract, checkpoints) stay NCHW; the
    # per-batch and sharded paths keep NCHW storage.
    # use_scan is THE predicate for the single-device scan engine; the layout
    # decision below must follow it exactly (an nhwc model fed nchw batches
    # by the per-batch engine would conv over garbage dimensions), so it is
    # computed once here and reused at the engine dispatch.
    use_scan = cfg.train.use_scan_epochs and mesh.devices.size == 1
    layout = (
        "nhwc"
        if getattr(cfg.train, "feature_layout", "nchw") == "nhwc" and use_scan
        else "nchw"
    )
    model = build_attack_model(cfg, input_layout=layout)
    tx = make_optimizer(cfg)

    sample = bd_train.feats[:1].astype(np.float32)
    if layout == "nhwc":
        sample = sample.transpose(0, 2, 3, 1)
    variables = jit_init(model, rnd.named_key(cfg.train.seed, "params"), sample)
    state = TrainState.create(variables, tx)
    if resume:
        # Elastic restart: pick up params/opt_state/step from the last best
        # checkpoint if one exists (the reference can only restart from
        # scratch — SURVEY.md §5 failure-recovery gap).
        import os as _os

        from audiobd_tpu.train.checkpoint import checkpoint_dir, load_checkpoint

        if _os.path.exists(checkpoint_dir(cfg.record_dir)):
            tree, _spec = load_checkpoint(cfg.record_dir)
            state = TrainState(
                params=tree["params"],
                batch_stats=tree.get("batch_stats", {}),
                opt_state=jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(state.opt_state),
                    jax.tree_util.tree_leaves(tree["opt_state"]),
                ),
                step=jnp.asarray(tree["step"]),
            )
            if verbose:
                print(f"resumed from step {int(state.step)}")
    state = shard_replicated(mesh, state)

    # Single-device: device-resident scan epochs (no per-batch host
    # dispatch). Multi-device pure-DP: the shard_map'd scan epoch (dataset
    # row-sharded over 'data', psum'd grads/metrics, sync-BN — exactly the
    # per-batch GSPMD step's numerics, without its per-batch dispatch).
    # Otherwise (tp axis in play): the per-batch path shards every batch
    # over the mesh's data axis and lets GSPMD lay out the rest.
    # (use_scan computed above, next to the layout decision that depends on it.)
    sharded_mode = getattr(cfg.train, "sharded_scan_epochs", "auto")
    sharded_ok = sharded_mode == "on" or (
        sharded_mode == "auto" and jax.default_backend() == "tpu"
    )
    use_sharded_scan = (
        cfg.train.use_scan_epochs
        and not use_scan
        and sharded_ok
        and mesh.shape["model"] == 1
        and cfg.train.batch_size % mesh.shape["data"] == 0
        # shard_layout needs ≥1 row per shard in every split; smaller
        # datasets fall back to the per-batch GSPMD path instead of
        # asserting mid-run (ADVICE r2).
        and min(len(bd_train), len(clean_test), len(bd_test)) >= mesh.shape["data"]
    )
    if use_scan:
        from audiobd_tpu.train.scan_epoch import (
            DeviceDataset,
            make_eval_epoch_fn,
            make_train_epoch_fn,
            run_eval_scan,
            run_train_epoch_scan,
        )

        train_epoch_fn = make_train_epoch_fn(model, tx)
        eval_epoch_fn = make_eval_epoch_fn(model)
        d_train = DeviceDataset(bd_train, layout=layout)
        d_clean = DeviceDataset(clean_test, layout=layout)
        d_bd = DeviceDataset(bd_test, layout=layout)
    elif use_sharded_scan:
        from audiobd_tpu.train.scan_epoch import (
            ShardedDeviceDataset,
            make_sharded_eval_epoch_fn,
            make_sharded_train_epoch_fn,
            run_eval_sharded,
            run_train_epoch_sharded,
        )

        train_epoch_fn = make_sharded_train_epoch_fn(model, tx, mesh)
        eval_epoch_fn = make_sharded_eval_epoch_fn(model, mesh)
        d_train = ShardedDeviceDataset(bd_train, mesh)
        d_clean = ShardedDeviceDataset(clean_test, mesh)
        d_bd = ShardedDeviceDataset(bd_test, mesh)
    train_step = make_train_step(model, tx)
    eval_step = make_eval_step(model)

    record_dir = cfg.record_dir
    model_spec = {
        "attack": cfg.name,
        "model": cfg.model,
        "num_classes": cfg.num_classes,
        "feature_size": linear_features_for(cfg.name, cfg.model),
        "n_mfcc": cfg.dsp.n_mfcc,
        # serving metadata (cli/infer.py): the label table and the eval batch
        # size whose batch-mean loss matches the training log
        "dataset": cfg.dataset,
        "batch_size": cfg.train.batch_size,
    }

    # Serializing a checkpoint (device→host transfer + Orbax write) costs
    # seconds over a tunneled backend and the monitored loss improves most
    # epochs early on. Keep the best state as a cheap on-device copy (the
    # train step donates its input, so a copy is required anyway) and hand
    # disk writes to a latest-wins background writer so the epoch loop never
    # blocks on serialization; the final best is always flushed below.
    best_holder: dict = {}
    writer = AsyncCheckpointWriter() if save else None

    def save_best(st):
        # One compiled program per copy (TrainState.device_copy) instead of
        # one eager op per leaf; the copy outlives the donating train step.
        best_holder["state"] = st.device_copy()
        if writer is not None:
            writer.submit(record_dir, best_holder["state"], model_spec)

    stopper = EarlyStopping(cfg.train.patience, save_fn=save_best, verbose=verbose)
    np_rng = rnd.np_rng(cfg.train.seed, "shuffle")
    dropout_key = rnd.named_key(cfg.train.seed, "dropout")

    history: dict[str, list] = {
        k: []
        for k in (
            "train_loss", "train_mix_acc", "train_asr",
            "test_clean_loss", "test_bd_loss", "test_clean_acc", "test_asr",
        )
    }

    from audiobd_tpu.utils.profiling import annotate

    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    n_clips = 0
    t_start = time.perf_counter()
    epochs_ran = 0
    try:
        for epoch in range(1, cfg.train.num_epochs + 1):
            with annotate(f"epoch_{epoch}"):
                if use_scan:
                    state, tr = run_train_epoch_scan(
                        train_epoch_fn, state, d_train, cfg.train.batch_size, dropout_key, np_rng
                    )
                    ev_clean = run_eval_scan(eval_epoch_fn, state, d_clean, cfg.train.batch_size)
                    ev_bd = run_eval_scan(eval_epoch_fn, state, d_bd, cfg.train.batch_size)
                elif use_sharded_scan:
                    state, tr = run_train_epoch_sharded(
                        train_epoch_fn, state, d_train, cfg.train.batch_size, dropout_key, np_rng
                    )
                    ev_clean = run_eval_sharded(eval_epoch_fn, state, d_clean, cfg.train.batch_size)
                    ev_bd = run_eval_sharded(eval_epoch_fn, state, d_bd, cfg.train.batch_size)
                else:
                    state, tr = run_train_epoch(
                        train_step, state, bd_train, cfg.train.batch_size, dropout_key, np_rng, mesh
                    )
                    ev_clean = run_eval(eval_step, state, clean_test, cfg.train.batch_size, mesh)
                    ev_bd = run_eval(eval_step, state, bd_test, cfg.train.batch_size, mesh)
            if profile_dir and epoch >= 2:
                jax.profiler.stop_trace()  # two epochs of device trace is plenty
                profile_dir = None
            n_clips += len(bd_train)
            epochs_ran = epoch

            history["train_loss"].append(tr["loss"])
            history["train_mix_acc"].append(tr["mix_acc"])
            history["train_asr"].append(tr["asr"])
            history["test_clean_loss"].append(ev_clean["loss"])
            history["test_bd_loss"].append(ev_bd["loss"])
            history["test_clean_acc"].append(ev_clean["acc"])
            history["test_asr"].append(ev_bd["asr"])

            monitored = 0.5 * (ev_clean["loss"] + ev_bd["loss"])
            if verbose:
                print(
                    f"Epoch {epoch}: Train loss: {tr['loss']:.4f}, Train asr: {tr['asr']:.4f}, "
                    f"Clean acc: {ev_clean['acc']:.4f}, ASR: {ev_bd['asr']:.4f}"
                )
            if stopper(monitored, state):
                if verbose:
                    print("Early stopping")
                break

    finally:
        if profile_dir:  # fewer than 2 epochs ran
            jax.profiler.stop_trace()
        if writer is not None:
            # Always drain the last submitted best state — an exception
            # mid-training (NaN loss, interrupt) must not strand a pending
            # improvement behind the pacing interval or leak the thread.
            # When the loop is already unwinding, a checkpoint-write error
            # must not supersede the original exception: log it instead.
            import sys as _sys

            if _sys.exc_info()[0] is None:
                writer.close()
            else:
                try:
                    writer.close()
                except BaseException as ckpt_err:
                    print(f"checkpoint write failed during unwind: {ckpt_err!r}")
    wall = time.perf_counter() - t_start
    result = TrainResult(
        history=history,
        state=state,
        model=model,
        epochs_ran=epochs_ran,
        clips_per_sec=n_clips / max(wall, 1e-9),
    )

    if save:
        os.makedirs(record_dir, exist_ok=True)
        save_attack_csvs(record_dir, history)
        try:
            from audiobd_tpu.utils.visual import plot_loss, plot_metrics

            plot_loss(
                history["train_loss"], history["test_clean_loss"], history["test_bd_loss"],
                os.path.join(record_dir, "loss.png"),
            )
            plot_metrics(
                history["train_mix_acc"], history["train_asr"],
                history["test_clean_acc"], history["test_asr"],
                os.path.join(record_dir, "acc-like metrics.png"),
            )
        except Exception as e:  # matplotlib backends can be flaky headless
            print(f"plotting skipped: {e}")
    return result
