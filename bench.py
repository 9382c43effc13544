"""Benchmark: poisoned-training throughput (clips/sec/chip) across workloads.

Per VERDICT r1 item 5 this measures, on the default device (the real TPU
chip under the driver):

* full device-resident training epochs (lax.scan over all batches) for
  smallcnn (f32 + bf16), largecnn, resnet and smalllstm on the BadNets
  feature shape (1, 101, 40), with an MFU estimate per workload (XLA
  cost-analysis FLOPs of one train step × batches / wall-clock, against the
  chip's bf16 peak);
* the fused-Pallas vs XLA MFCC front-end on a (512, 16000) waveform batch;
* an end-to-end poisoned number: waveforms → device MFCC → BadNets patch →
  one training epoch (the north-star "poisoned clips/sec/chip" includes the
  poisoning+DSP stage, BASELINE.json).

The torch-CPU baseline is the reference-equivalent smallcnn train step (the
reference is single-device torch with no published numbers — BASELINE.md).
Timing uses device_get-forced synchronization (block_until_ready does not
synchronize on the axon backend — CLAUDE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/sec/chip", "vs_baseline": N,
   "detail": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# BENCH_SMOKE=1: tiny-shape dress rehearsal of every row's code path (CPU
# deflake for the campaign's bench stage). Output is labeled smoke and is
# never replayable as evidence — real captures always run full shapes.
SMOKE = bool(os.environ.get("BENCH_SMOKE"))
BATCH = 32 if SMOKE else 256
SHAPE = (BATCH, 1, 101, 40)
N_CLIPS = 256 if SMOKE else 20480  # a Speech-Commands-scale poisoned train split
TIMED_EPOCHS = 1 if SMOKE else 3
MFCC_BATCH = 16 if SMOKE else 512
MFCC_ITERS = 2 if SMOKE else 20
# v5e: 197 bf16 TFLOP/s per chip; override for other generations.
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", 197.0))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _wait_for_backend() -> bool:
    """Bounded wait for the (tunneled) default backend before importing jax.

    A wedged axon tunnel HANGS `import jax` in-process (sitecustomize dials
    the remote chip during plugin registration — CLAUDE.md), so the probe
    must run in a killable subprocess. Retrying a few times lets a transient
    outage degrade to a late capture instead of rc 1 (VERDICT r3 item 1).
    """
    import subprocess

    attempts = int(os.environ.get("BENCH_BACKEND_RETRIES", 10))
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; print(jax.devices())"],
                timeout=120, capture_output=True, text=True,
            )
            if r.returncode == 0:
                log(f"backend probe ok: {r.stdout.strip()}")
                return True
            log(f"backend probe rc={r.returncode}: {r.stderr.strip()[-300:]}")
        except subprocess.TimeoutExpired:
            log(f"backend probe timed out (attempt {i + 1}/{attempts})")
        if i + 1 < attempts:
            time.sleep(int(os.environ.get("BENCH_BACKEND_RETRY_SECS", 60)))
    return False


def _rearm_watcher() -> None:
    """Re-arm the TPU campaign watcher on any bench entry (VERDICT r3 item 1:
    the watcher must not be one mortal loop). Pidfile-guarded + no-op once
    the campaign is complete; never fatal to the bench itself."""
    if os.environ.get("AUDIOBD_NO_WATCHER"):
        return
    import subprocess

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "ensure_watcher.sh")
    if not os.path.exists(script):
        return
    try:
        subprocess.run(["bash", script], timeout=30, capture_output=True)
    except Exception as e:
        log(f"watcher re-arm skipped: {e}")


def _make_data(rng):
    from audiobd_tpu.train.loop import ArraySet

    return ArraySet(
        rng.standard_normal((N_CLIPS,) + SHAPE[1:]).astype(np.float32),
        rng.integers(0, 10, N_CLIPS).astype(np.int64),
        (rng.random(N_CLIPS) < 0.1).astype(np.int64),
    )


def bench_workload(model_name: str, dtype: str) -> dict:
    """Train-epoch throughput + MFU for one (model, dtype) workload.

    The epoch function is lowered+compiled ONCE; the same executable serves
    the XLA cost analysis (a lax.scan body is counted once, so its FLOPs ≈
    one step's — × n_batches gives the epoch count) and the timed run, so
    each workload pays a single tunnel compile.
    """
    import jax
    import jax.numpy as jnp

    from audiobd_tpu.configs import make_config
    from audiobd_tpu.train.scan_epoch import (
        DeviceDataset,
        make_perm,
        make_train_epoch_fn,
        pad_plan,
    )
    from audiobd_tpu.models import jit_init
    from audiobd_tpu.train.state import TrainState
    from audiobd_tpu.train.trainer import build_attack_model, make_optimizer

    cfg = make_config("badnets", model=model_name, batch_size=BATCH, compute_dtype=dtype)
    model = build_attack_model(cfg)
    tx = make_optimizer(cfg)
    data = _make_data(np.random.default_rng(0))
    dset = DeviceDataset(data)
    variables = jit_init(model, jax.random.PRNGKey(0), jnp.asarray(data.feats[:1]))
    state = TrainState.create(variables, tx)
    epoch_fn = make_train_epoch_fn(model, tx)
    key = jax.random.PRNGKey(1)
    np_rng = np.random.default_rng(1)

    n_batches, mask = pad_plan(dset.n, BATCH)
    perm = jnp.asarray(make_perm(np_rng, dset.n, n_batches, BATCH))
    mask = jnp.asarray(mask)
    args = (state, dset.feats, dset.labels, dset.indicators, perm, mask, key)
    compiled = epoch_fn.lower(*args).compile()
    ca = compiled.cost_analysis()
    step_flops = float(ca["flops"]) if ca and "flops" in ca else None

    def run_epoch(state):
        state, losses, sums = compiled(state, dset.feats, dset.labels, dset.indicators, perm, mask, key)
        jax.device_get(sums)  # force (block_until_ready lies on axon)
        return state

    state = run_epoch(state)  # warmup execution
    t0 = time.perf_counter()
    for _ in range(TIMED_EPOCHS):
        state = run_epoch(state)
    dt = (time.perf_counter() - t0) / TIMED_EPOCHS
    clips = N_CLIPS / dt
    out = {"clips_per_sec": round(clips, 1), "epoch_sec": round(dt, 4)}
    if step_flops:
        tflops = step_flops * n_batches / dt / 1e12
        out["achieved_tflops"] = round(tflops, 2)
        out["mfu_vs_bf16_peak_pct"] = round(100.0 * tflops / PEAK_TFLOPS, 2)
    log(f"{model_name}/{dtype}: {clips:.0f} clips/s/chip"
        + (f", {out['achieved_tflops']} TF/s ({out['mfu_vs_bf16_peak_pct']}% of bf16 peak)"
           if step_flops else ""))
    return out


def bench_ensemble(model_name: str, dtype: str, k: int = 8) -> dict:
    """Aggregate throughput of K models training simultaneously (vmapped
    ensemble, train/ensemble.py) — the MXU sees K× the rows per step, so
    aggregate clips/s and MFU scale far past the single-model numbers."""
    import jax
    import jax.numpy as jnp

    from audiobd_tpu.configs import make_config
    from audiobd_tpu.train.ensemble import (
        init_ensemble,
        make_ensemble_train_epoch_fn,
        stack_perms,
    )
    from audiobd_tpu.train.scan_epoch import DeviceDataset
    from audiobd_tpu.train.trainer import build_attack_model, make_optimizer

    cfg = make_config("badnets", model=model_name, batch_size=BATCH, compute_dtype=dtype)
    model = build_attack_model(cfg)
    tx = make_optimizer(cfg)
    dset = DeviceDataset(_make_data(np.random.default_rng(0)))
    keys = jnp.stack([jax.random.PRNGKey(i) for i in range(k)])
    states = init_ensemble(model, tx, dset.feats[:1], keys)
    epoch_fn = make_ensemble_train_epoch_fn(model, tx)
    np_rngs = [np.random.default_rng(100 + i) for i in range(k)]
    perms, mask = stack_perms(np_rngs, dset.n, BATCH)
    args = (states, dset.feats, dset.labels, dset.indicators, perms, mask, keys)
    compiled = epoch_fn.lower(*args).compile()
    ca = compiled.cost_analysis()
    epoch_flops = float(ca["flops"]) * perms.shape[1] if ca and "flops" in ca else None

    def run_epoch(states):
        states, losses, sums = compiled(states, dset.feats, dset.labels, dset.indicators, perms, mask, keys)
        jax.device_get(sums)
        return states

    states = run_epoch(states)
    t0 = time.perf_counter()
    for _ in range(TIMED_EPOCHS):
        states = run_epoch(states)
    dt = (time.perf_counter() - t0) / TIMED_EPOCHS
    clips = N_CLIPS * k / dt
    out = {"members": k, "aggregate_clips_per_sec": round(clips, 1), "epoch_sec": round(dt, 4)}
    if epoch_flops:
        tflops = epoch_flops / dt / 1e12
        out["achieved_tflops"] = round(tflops, 2)
        out["mfu_vs_bf16_peak_pct"] = round(100.0 * tflops / PEAK_TFLOPS, 2)
    log(f"ensemble {model_name}x{k}/{dtype}: {clips:.0f} aggregate clips/s/chip"
        + (f", {out['achieved_tflops']} TF/s ({out['mfu_vs_bf16_peak_pct']}% of bf16 peak)"
           if epoch_flops else ""))
    return out


def bench_mfcc() -> dict:
    """Fused-Pallas vs XLA MFCC on a (512, 16000) batch (jingleback params)."""
    import jax
    import jax.numpy as jnp

    from audiobd_tpu.dsp.mfcc import MFCCParams, mfcc_features

    params = MFCCParams(sample_rate=16000, n_mfcc=40, n_fft=400, hop_length=160)
    wavs = jnp.asarray(
        np.random.default_rng(2).standard_normal((MFCC_BATCH, 16000)).astype(np.float32)
    )

    def timed(fn):
        out = fn(wavs)
        jax.device_get(out[:1, ..., :1, :1])  # force
        t0 = time.perf_counter()
        for _ in range(MFCC_ITERS):
            out = fn(wavs)
        jax.device_get(out[:1, ..., :1, :1])
        return (time.perf_counter() - t0) / MFCC_ITERS

    xla = jax.jit(lambda w: mfcc_features(w, params))
    t_xla = timed(xla)
    result = {"xla_ms": round(t_xla * 1e3, 3),
              "xla_clips_per_sec": round(MFCC_BATCH / t_xla, 1)}
    try:
        from audiobd_tpu.ops.pallas_mfcc import fused_mfcc_features

        pallas = jax.jit(lambda w: fused_mfcc_features(w, params))
        t_pal = timed(pallas)
        result["pallas_ms"] = round(t_pal * 1e3, 3)
        result["pallas_clips_per_sec"] = round(MFCC_BATCH / t_pal, 1)
        result["pallas_speedup"] = round(t_xla / t_pal, 3)
    except Exception as e:
        log(f"pallas mfcc bench failed: {e}")
    log(f"mfcc front-end: {result}")
    return result


def bench_end_to_end() -> dict:
    """North-star: waveforms → MFCC → BadNets patch → one training epoch.

    Uses poison.badnets.poison_waveforms_device — the same
    poison/device_prep.py program family the shipped pipeline executes
    (data/speech_commands.py first-run ingest + badnets.poison's
    device-resident patch): ONE compiled program for dequantize+MFCC+patch
    over the whole dataset (lax.map over chunk blocks inside the jit),
    output device-resident straight into DeviceDataset. The 1.31 GB waveform ingest is dispatched asynchronously
    and OVERLAPPED with compiling the exact full-shape prep program on
    device zeros, so its cost is (mostly) hidden behind the compile the run
    pays anyway; both the total and the residual-after-compile are reported.
    """
    import jax
    import jax.numpy as jnp

    from audiobd_tpu.configs import make_config
    from audiobd_tpu.data.speech_commands import mfcc_params
    from audiobd_tpu.poison.badnets import generate_trigger, poison_waveforms_device
    from audiobd_tpu.train.loop import ArraySet
    from audiobd_tpu.train.scan_epoch import (
        DeviceDataset,
        make_train_epoch_fn,
        run_train_epoch_scan,
    )
    from audiobd_tpu.models import jit_init
    from audiobd_tpu.train.state import TrainState
    from audiobd_tpu.train.trainer import build_attack_model, make_optimizer

    cfg = make_config("badnets", model="smallcnn", batch_size=BATCH, compute_dtype="bfloat16")
    params = mfcc_params(cfg)
    trigger = jnp.asarray(
        generate_trigger(cfg.dsp.n_mfcc, 101, cfg.trigger_size, save_path=None)
    )
    rng = np.random.default_rng(3)
    # Wav data is natively int16 PCM (data/wavio.py): ship PCM over the
    # bandwidth-bound host link at half the bytes; the prep program
    # dequantizes on device.
    wavs = (rng.standard_normal((N_CLIPS, 16000)) * 3276.7).astype(np.int16)
    labels = rng.integers(0, 10, N_CLIPS).astype(np.int64)
    indicators = (rng.random(N_CLIPS) < 0.1).astype(np.int64)
    chunk = int(os.environ.get("BENCH_PREP_CHUNK", 128 if SMOKE else 2048))

    # ingest: dispatch async, then compile the exact full-shape prep program
    # on device zeros while the transfer streams; force afterwards.
    t0 = time.perf_counter()
    wavs_dev = jax.device_put(wavs)
    ind_dev = jax.device_put(jnp.asarray(indicators, jnp.int32))
    warm = poison_waveforms_device(
        jnp.zeros((N_CLIPS, 16000), jnp.int16), jnp.zeros((N_CLIPS,), jnp.int32),
        trigger, params, chunk=chunk,
    )
    jax.device_get(warm[-1, :1, :1, :1])
    t_compile_point = time.perf_counter() - t0
    jax.device_get(wavs_dev[-1, :1])
    t_ingest_total = time.perf_counter() - t0
    log(f"e2e ingest (host→device, {wavs.nbytes / 1e9:.2f} GB): {t_ingest_total:.2f} s total, "
        f"{max(t_ingest_total - t_compile_point, 0.0):.2f} s residual after prep compile")

    # min-of-N on both timed legs: tunnel dispatch jitter inflates a single
    # reading, never deflates it (same rationale as the torch baseline's
    # min-of-N; the r5 verify run read the one-shot epoch 20% high).
    prep_secs = []
    for _ in range(1 if SMOKE else 2):
        t0 = time.perf_counter()
        feats = poison_waveforms_device(wavs_dev, ind_dev, trigger, params, chunk=chunk)
        jax.device_get(feats[-1, :1, :1, :1])  # force (block_until_ready lies on axon)
        prep_secs.append(time.perf_counter() - t0)
    t_prep = min(prep_secs)
    log(f"e2e poison+MFCC (on device): {t_prep:.3f} s for {N_CLIPS} clips "
        f"({N_CLIPS / t_prep:.0f} clips/s)")
    t_ingest = t_ingest_total

    data = ArraySet(feats, labels, indicators)
    dset = DeviceDataset(data)
    model = build_attack_model(cfg)
    tx = make_optimizer(cfg)
    variables = jit_init(model, jax.random.PRNGKey(0), jnp.asarray(feats[:1]))
    state = TrainState.create(variables, tx)
    epoch_fn = make_train_epoch_fn(model, tx)
    key = jax.random.PRNGKey(1)
    np_rng = np.random.default_rng(1)
    state, _ = run_train_epoch_scan(epoch_fn, state, dset, BATCH, key, np_rng)
    epoch_secs = []
    for _ in range(TIMED_EPOCHS):
        t0 = time.perf_counter()
        state, _ = run_train_epoch_scan(epoch_fn, state, dset, BATCH, key, np_rng)
        epoch_secs.append(time.perf_counter() - t0)
    t_epoch = min(epoch_secs)
    e2e = N_CLIPS / (t_prep + t_epoch)
    log(f"e2e poisoned train: {e2e:.0f} clips/s/chip (prep {t_prep:.2f}s + epoch {t_epoch:.2f}s)")
    return {
        "ingest_sec": round(t_ingest, 2),
        "ingest_residual_after_compile_sec": round(max(t_ingest - t_compile_point, 0.0), 2),
        "poison_mfcc_clips_per_sec": round(N_CLIPS / t_prep, 1),
        "train_epoch_clips_per_sec": round(N_CLIPS / t_epoch, 1),
        "end_to_end_clips_per_sec": round(e2e, 1),
    }


_TORCH_ALONE_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "record", "torch_baseline_alone.json"
)


def _load_torch_alone() -> dict | None:
    try:
        with open(_TORCH_ALONE_FILE) as f:
            alone = json.load(f)
    except (OSError, ValueError):
        return None
    # A truncated/hand-edited sidecar missing the key must not KeyError the
    # whole torch leg (which would drop a perfectly good fresh measurement).
    if not isinstance(alone, dict) or not isinstance(
        alone.get("clips_per_sec"), (int, float)
    ):
        return None
    return alone


def bench_torch_reference() -> dict:
    """Reference-equivalent torch smallcnn train step on host CPU.

    Contention-proofed (VERDICT r4 weak #4: a campaign stage holding the
    single core made the driver's r4 capture read 13.1 clips/s vs 92.2
    measured alone — a 7x-wrong headline ratio). Defenses: (a) min-of-N
    per-step timing instead of a mean, (b) loadavg before/after recorded in
    the output, (c) a repo-resident last-known-alone sidecar
    (record/torch_baseline_alone.json): a fresh measurement below half the
    alone value, or loadavg > 1.5 on this 1-core host, is flagged
    ``contended`` and the alone value is reported as the ratio fallback;
    an uncontended fresh measurement updates the sidecar."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    class SmallCNN(tnn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = tnn.Conv2d(1, 64, 2)
            self.b1 = tnn.BatchNorm2d(64)
            self.c2 = tnn.Conv2d(64, 64, 2)
            self.b2 = tnn.BatchNorm2d(64)
            self.c3 = tnn.Conv2d(64, 32, 2)
            self.b3 = tnn.BatchNorm2d(32)
            self.d1 = tnn.Dropout(0.4)
            self.f1 = tnn.Linear(3072, 128)
            self.d2 = tnn.Dropout(0.5)
            self.f2 = tnn.Linear(128, 10)

        def forward(self, x):
            x = F.max_pool2d(self.b1(F.relu(self.c1(x))), (1, 3))
            x = F.max_pool2d(self.b2(F.relu(self.c2(x))), (2, 2), padding=(1, 1))
            x = F.max_pool2d(self.b3(F.relu(self.c3(x))), (2, 2), padding=(0, 1))
            x = self.d1(x).flatten(1)
            x = self.d2(F.relu(self.f1(x)))
            return F.log_softmax(self.f2(x), dim=1)

    torch.manual_seed(0)
    model = SmallCNN()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    crit = tnn.CrossEntropyLoss()
    x = torch.randn(SHAPE)
    y = torch.randint(0, 10, (BATCH,))

    def one_step():
        opt.zero_grad()
        loss = crit(model(x), y)
        loss.backward()
        opt.step()

    load_before = os.getloadavg()[0]
    for _ in range(2):
        one_step()
    n = 6
    step_secs = []
    for _ in range(n):
        t0 = time.perf_counter()
        one_step()
        step_secs.append(time.perf_counter() - t0)
    load_after = os.getloadavg()[0]
    dt = min(step_secs)  # min-of-N: intermittent contention inflates, never deflates
    clips = BATCH / dt
    alone = _load_torch_alone()
    # The 0.5x-of-alone clause only makes sense at the full bench shape: the
    # sidecar is a batch-256 number, so comparing a BENCH_SMOKE batch-32
    # reading against it would false-flag rehearsals. Load check suffices there.
    contended = max(load_before, load_after) > 1.5 or (
        not SMOKE and alone is not None and clips < 0.5 * alone["clips_per_sec"]
    )
    out = {
        "clips_per_sec": round(clips, 1),
        "min_step_ms": round(dt * 1e3, 1),
        "load_before": round(load_before, 2),
        "load_after": round(load_after, 2),
        "contended": contended,
    }
    if contended and alone is not None:
        # ratio fallback: the last measurement taken with the core free
        out["ratio_reference_clips_per_sec"] = alone["clips_per_sec"]
        out["ratio_reference_source"] = alone.get("source", "sidecar")
        log(
            f"torch-cpu reference CONTENDED (load {load_before:.2f}->{load_after:.2f}, "
            f"measured {clips:.0f} clips/s); ratio falls back to alone value "
            f"{alone['clips_per_sec']} ({alone.get('source', 'sidecar')})"
        )
    elif not contended and not SMOKE:
        out["ratio_reference_clips_per_sec"] = out["clips_per_sec"]
        # The sidecar holds the BEST uncontended measurement: a run that
        # passes the (necessarily weak) contention gate while the core is
        # partially busy would otherwise ratchet the alone reference down
        # permanently (r5: an uncontended-flagged 66.0 overwrote 86.6), and
        # with it the 0.5x gate threshold. Torch-alone wobble is 64-92
        # clips/s; keeping the max loses nothing on this fixed fixture.
        if alone is None or out["clips_per_sec"] >= alone["clips_per_sec"]:
            try:
                os.makedirs(os.path.dirname(_TORCH_ALONE_FILE), exist_ok=True)
                with open(_TORCH_ALONE_FILE, "w") as f:
                    json.dump(
                        {
                            "clips_per_sec": out["clips_per_sec"],
                            "min_step_ms": out["min_step_ms"],
                            "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                            "source": "bench.py measured alone (min-of-6 steps)",
                        },
                        f,
                    )
            except OSError as e:
                log(f"could not update torch alone sidecar: {e}")
    else:
        out["ratio_reference_clips_per_sec"] = out["clips_per_sec"]
    log(f"torch-cpu reference: {dt * 1e3:.1f} ms/step, {clips:.0f} clips/s (contended={contended})")
    return out


def _replay_last_capture(candidates=None) -> bool:
    """Backend-down fallback: replay a REAL bench JSON the recovery campaign
    captured earlier this round, instead of exiting with no artifact at all.

    The campaign's `bench` stage runs this same script on the live chip and
    its stdout JSON lands in $LOGDIR/bench.log and (committed) CAMPAIGN_r4.md.
    If the tunnel is wedged again when the driver benches, re-emitting that
    measurement — provenance-labeled — is strictly more informative than
    rc 1. Synthetic/CPU numbers are never substituted; no capture → still
    exit 1."""
    import re

    if candidates is None:
        here = os.path.dirname(os.path.abspath(__file__))
        candidates = [
            os.path.join(os.environ.get("LOGDIR", "/tmp/r4_campaign"), "bench.log"),
            # committed round-5 live-TPU capture (session-3 recovery re-run)
            os.path.join(here, "record", "bench_r5_session3_recovery.json"),
            os.path.join(here, "CAMPAIGN_r4.md"),
        ]
    for path in candidates:
        try:
            with open(path) as f:
                text = f.read()
        except OSError:
            continue
        # bench.log: the JSON is a whole line; CAMPAIGN_r4.md: inside a
        # `| bench_json | ... | `{...}` |` row (backtick-wrapped).
        m = re.search(r'^\{"metric".*\}$', text, re.MULTILINE) or re.search(
            r'`(\{"metric".*\})`', text
        )
        if not m:
            continue
        try:
            payload = json.loads(m.group(1) if m.lastindex else m.group(0))
        except (json.JSONDecodeError, IndexError):
            continue
        if not isinstance(payload.get("value"), (int, float)):
            continue
        if isinstance(payload.get("detail"), dict) and payload["detail"].get("smoke"):
            continue  # a BENCH_SMOKE rehearsal is not evidence
        payload.setdefault("detail", {})["replayed_capture"] = {
            "source": path,
            "reason": "axon backend unavailable at driver bench time; this is "
                      "the round's campaign-captured TPU measurement, re-emitted",
        }
        print(json.dumps(payload))
        log(f"backend down — replayed campaign-captured bench from {path}")
        return True
    return False


def _preempt_campaign():
    """The bench must own the (single) chip and CPU core: if the recovery
    campaign is mid-stage when the driver benches, both degrade. Stop the
    campaign process tree (stages are resumable — the watcher restarts it
    once bench.pid clears) and advertise this bench run via a pidfile that
    the watcher and the campaign's stage loop both respect."""
    logdir = os.environ.get("LOGDIR", "/tmp/r4_campaign")
    os.makedirs(logdir, exist_ok=True)
    with open(os.path.join(logdir, "bench.pid"), "w") as f:
        f.write(str(os.getpid()))

    def _children(p):
        out = []
        try:
            for task in os.listdir(f"/proc/{p}/task"):
                with open(f"/proc/{p}/task/{task}/children") as fh:
                    out += [int(c) for c in fh.read().split()]
        except OSError:
            pass
        return out

    try:
        with open(os.path.join(logdir, "campaign.pid")) as f:
            root = int(f.read().strip())
    except (OSError, ValueError):
        return
    import signal

    tree, i = [root], 0
    while i < len(tree):
        tree.extend(_children(tree[i]))
        i += 1
    for p in reversed(tree):  # leaves first: no orphaned TPU-holding python
        try:
            os.kill(p, signal.SIGTERM)
        except OSError:
            pass
    log(f"preempted running campaign (pids {tree}); watcher will resume it")


def _clear_bench_pid():
    try:
        os.remove(os.path.join(os.environ.get("LOGDIR", "/tmp/r4_campaign"), "bench.pid"))
    except OSError:
        pass


def main():
    # AUDIOBD_PLATFORM pins the backend like the CLI dispatcher does
    # (audiobd_tpu/__main__.py) — the only way to exercise bench code while
    # the axon tunnel is wedged. Skips the tunnel wait: the pinned backend
    # is local.
    if os.environ.get("AUDIOBD_PLATFORM"):
        import jax as _jax

        _jax.config.update("jax_platforms", os.environ["AUDIOBD_PLATFORM"])
    elif not _wait_for_backend():
        _rearm_watcher()  # the watcher captures the campaign when it returns
        if _replay_last_capture():
            sys.exit(0)
        log("backend never came up and no prior capture exists — aborting")
        sys.exit(1)
    # campaign's own bench entry keeps its lock; a SMOKE rehearsal is
    # side-effect-free (no preemption, no pidfile, no watcher re-arm)
    if not os.environ.get("AUDIOBD_NO_WATCHER") and not SMOKE:
        _preempt_campaign()
        import atexit

        atexit.register(_clear_bench_pid)

    import jax

    from audiobd_tpu.utils.compile_cache import enable_compilation_cache

    # Persistent cache: reruns skip the ~20-60 s/program tunnel compiles.
    # Timed regions all warm up first, so steady-state numbers are unaffected.
    enable_compilation_cache("auto")
    log(f"devices: {jax.devices()}")
    detail: dict = {"workloads": {}}
    if SMOKE:
        detail["smoke"] = True  # tiny shapes — never quote as a measurement
        log(f"BENCH_SMOKE: tiny shapes (batch {BATCH}, {N_CLIPS} clips) — rehearsal only")
    grid = [
        ("smallcnn", "float32"),
        ("smallcnn", "bfloat16"),
        ("largecnn", "bfloat16"),
        ("resnet", "bfloat16"),
        ("smalllstm", "bfloat16"),
        # the remaining two reference --model choices (utils/models.py:180-257):
        # the attention einsum + 2x biLSTM stack, and the 3-layer LSTM(768)
        ("lstmwithattention", "bfloat16"),
        ("rnn", "bfloat16"),
    ]
    # BENCH_ONLY: comma-separated substrings selecting rows to run (matching
    # against workload names / "ensemble" / "mfcc" / "e2e" / "torch").
    # Rehearsal + debugging aid — real captures run everything (unset).
    only = [s for s in os.environ.get("BENCH_ONLY", "").split(",") if s]

    def _selected(row_name: str) -> bool:
        return not only or any(s in row_name for s in only)

    headline = None
    for name, dtype in grid:
        if not _selected(f"{name}_{dtype}"):
            continue
        try:
            res = bench_workload(name, dtype)
            detail["workloads"][f"{name}_{dtype}"] = res
            if name == "smallcnn" and dtype == "float32":
                headline = res["clips_per_sec"]
        except Exception as e:
            log(f"workload {name}/{dtype} failed: {e}")
    if _selected("ensemble"):
        try:
            detail["workloads"]["ensemble_smallcnn_x8_bfloat16"] = bench_ensemble("smallcnn", "bfloat16", k=8)
        except Exception as e:
            log(f"ensemble workload failed: {e}")
    if _selected("mfcc"):
        try:
            detail["mfcc_front_end"] = bench_mfcc()
        except Exception as e:
            log(f"mfcc bench failed: {e}")
    if _selected("e2e"):
        try:
            detail["end_to_end_badnets_smallcnn_bf16"] = bench_end_to_end()
        except Exception as e:
            log(f"end-to-end bench failed: {e}")
    ref = None
    if _selected("torch"):
        try:
            tref = bench_torch_reference()
            detail["torch_cpu_smallcnn_f32"] = tref["clips_per_sec"]
            detail["torch_cpu_baseline"] = tref
            ref = tref["ratio_reference_clips_per_sec"]
        except Exception as e:
            log(f"torch baseline failed: {e}")
    vs = round(headline / ref, 2) if (headline and ref) else None
    print(
        json.dumps(
            {
                "metric": "badnets_smallcnn_train_throughput",
                "value": headline,
                "unit": "clips/sec/chip",
                "vs_baseline": vs,
                "detail": detail,
            }
        )
    )
    if not SMOKE:
        _rearm_watcher()


if __name__ == "__main__":
    main()
