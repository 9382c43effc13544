"""Benchmark: poisoned-training throughput (clips/sec/chip).

Measures full device-resident training epochs (lax.scan over all batches)
of the BadNets workload (smallcnn, batch 256, MFCC (1, 101, 40), 20480
clips) on the default device — the real TPU chip under the driver — and
compares against the reference-equivalent PyTorch training step executed on
this host's CPU (the reference is single-device torch with no published
numbers — BASELINE.md; the live torch measurement is the only baseline
available in this image). Timing uses device_get-forced synchronization
(block_until_ready does not synchronize on the axon backend).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "clips/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BATCH = 256
SHAPE = (BATCH, 1, 101, 40)
WARMUP = 5
ITERS = 30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N_CLIPS = 20480  # a Speech-Commands-scale poisoned train split


def bench_ours() -> float:
    """Full device-resident training epochs (lax.scan over all batches) at
    dataset scale — the framework's production path on one chip."""
    import jax

    log(f"devices: {jax.devices()}")
    clips = _bench_ours_dtype("float32")
    log(f"ours (f32): {clips:.0f} clips/s/chip")
    return clips


def bench_ours_bf16() -> float:
    return _bench_ours_dtype("bfloat16")


def _bench_ours_dtype(dtype: str) -> float:
    import jax
    import jax.numpy as jnp

    from audiobd_tpu.configs import make_config
    from audiobd_tpu.train.loop import ArraySet
    from audiobd_tpu.train.scan_epoch import (
        DeviceDataset,
        make_train_epoch_fn,
        run_train_epoch_scan,
    )
    from audiobd_tpu.train.state import TrainState
    from audiobd_tpu.train.trainer import build_attack_model, make_optimizer

    cfg = make_config("badnets", model="smallcnn", batch_size=BATCH, compute_dtype=dtype)
    model = build_attack_model(cfg)
    tx = make_optimizer(cfg)
    rng = np.random.default_rng(0)
    data = ArraySet(
        rng.standard_normal((N_CLIPS,) + SHAPE[1:]).astype(np.float32),
        rng.integers(0, 10, N_CLIPS).astype(np.int64),
        (rng.random(N_CLIPS) < 0.1).astype(np.int64),
    )
    dset = DeviceDataset(data)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(data.feats[:1]), train=False)
    state = TrainState.create(variables, tx)
    epoch_fn = make_train_epoch_fn(model, tx)
    key = jax.random.PRNGKey(1)
    np_rng = np.random.default_rng(1)
    state, _ = run_train_epoch_scan(epoch_fn, state, dset, BATCH, key, np_rng)
    t0 = time.perf_counter()
    for _ in range(5):
        state, _m = run_train_epoch_scan(epoch_fn, state, dset, BATCH, key, np_rng)
    dt = (time.perf_counter() - t0) / 5
    return N_CLIPS / dt


def bench_torch_reference() -> float:
    """Reference-equivalent torch smallcnn train step on host CPU."""
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

    for _ in range(2):
        one_step()
    t0 = time.perf_counter()
    n = 6
    for _ in range(n):
        one_step()
    dt = (time.perf_counter() - t0) / n
    clips = BATCH / dt
    log(f"torch-cpu reference: {dt * 1e3:.1f} ms/step, {clips:.0f} clips/s")
    return clips


def main():
    ours = bench_ours()
    try:
        ours_bf16 = bench_ours_bf16()
        log(f"bf16 mixed precision: {ours_bf16:.0f} clips/s/chip ({ours_bf16 / ours:.2f}x f32)")
    except Exception as e:
        log(f"bf16 bench failed: {e}")
    try:
        ref = bench_torch_reference()
    except Exception as e:
        log(f"torch baseline failed: {e}")
        ref = None
    vs = round(ours / ref, 2) if ref else None
    print(
        json.dumps(
            {
                "metric": "badnets_smallcnn_train_throughput",
                "value": round(ours, 1),
                "unit": "clips/sec/chip",
                "vs_baseline": vs,
            }
        )
    )


if __name__ == "__main__":
    main()
