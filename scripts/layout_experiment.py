"""NHWC-vs-NCHW device-resident feature layout shootout (VERDICT r4 item 5).

The round-4 profile attributes ~20% of the 3.7 ms smallcnn bf16 step to
copies/reshapes/pads, and every model pays an NCHW→NHWC transpose per batch
(models/zoo.py input transpose; features are stored NCHW, C=1). This times a
full dataset-scale train epoch (bench shape: 20480 clips, batch 256) with
features stored each way:

  nchw — status quo: dataset (N,1,F,M), model transposes per step
  nhwc — TrainConfig.feature_layout="nhwc": dataset relaid (N,F,M,1) once
         at adoption, model consumes batches directly

Run on the TPU fixture:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/layout_experiment.py
Prints one JSON row per (model, dtype, layout); the decision (flip the scan
engine default or record a dead end) goes to VALIDATION.md/CLAUDE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from audiobd_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache("auto")

import jax  # noqa: E402

if os.environ.get("AUDIOBD_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["AUDIOBD_PLATFORM"])

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from audiobd_tpu.configs import make_config  # noqa: E402
from audiobd_tpu.models import jit_init  # noqa: E402
from audiobd_tpu.train.loop import ArraySet  # noqa: E402
from audiobd_tpu.train.scan_epoch import (  # noqa: E402
    DeviceDataset,
    make_perm,
    make_train_epoch_fn,
    pad_plan,
)
from audiobd_tpu.train.state import TrainState  # noqa: E402
from audiobd_tpu.train.trainer import build_attack_model, make_optimizer  # noqa: E402

SMOKE = bool(os.environ.get("LAYOUT_SMOKE"))
BATCH = 32 if SMOKE else 256
N_CLIPS = 256 if SMOKE else 20480
TIMED_EPOCHS = 2 if SMOKE else 5
MODELS = os.environ.get("LAYOUT_MODELS", "smallcnn,smalllstm").split(",")
DTYPES = os.environ.get("LAYOUT_DTYPES", "bfloat16,float32").split(",")


def bench_one(model_name: str, dtype: str, layout: str) -> dict:
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((N_CLIPS, 1, 101, 40)).astype(np.float32)
    labels = rng.integers(0, 10, N_CLIPS).astype(np.int64)
    ind = (rng.random(N_CLIPS) < 0.1).astype(np.int64)
    data = ArraySet(feats, labels, ind)

    cfg = make_config("badnets", model=model_name, batch_size=BATCH, compute_dtype=dtype)
    model = build_attack_model(cfg, input_layout=layout)
    tx = make_optimizer(cfg)
    dset = DeviceDataset(data, layout=layout)
    sample = data.feats[:1] if layout == "nchw" else np.transpose(data.feats[:1], (0, 2, 3, 1))
    variables = jit_init(model, jax.random.PRNGKey(0), jnp.asarray(sample))
    state = TrainState.create(variables, tx)
    epoch_fn = make_train_epoch_fn(model, tx)
    key = jax.random.PRNGKey(1)

    n_batches, mask = pad_plan(dset.n, BATCH)
    perm = jnp.asarray(make_perm(np.random.default_rng(1), dset.n, n_batches, BATCH))
    mask = jnp.asarray(mask)
    args = (state, dset.feats, dset.labels, dset.indicators, perm, mask, key)
    compiled = epoch_fn.lower(*args).compile()

    def run_epoch(state):
        state, losses, sums = compiled(
            state, dset.feats, dset.labels, dset.indicators, perm, mask, key
        )
        jax.device_get(sums)  # force (block_until_ready lies on axon)
        return state

    state = run_epoch(state)  # warmup
    t0 = time.perf_counter()
    for _ in range(TIMED_EPOCHS):
        state = run_epoch(state)
    dt = (time.perf_counter() - t0) / TIMED_EPOCHS
    return {
        "model": model_name,
        "dtype": dtype,
        "layout": layout,
        "epoch_sec": round(dt, 4),
        "clips_per_sec": round(N_CLIPS / dt, 1),
    }


def main():
    rows = []
    for model_name in MODELS:
        for dtype in DTYPES:
            base = {}
            for layout in ("nchw", "nhwc"):
                row = bench_one(model_name, dtype, layout)
                rows.append(row)
                base[layout] = row["clips_per_sec"]
                print(json.dumps(row), flush=True)
            print(
                f"# {model_name}/{dtype}: nhwc/nchw speedup "
                f"{base['nhwc'] / base['nchw']:.3f}x",
                flush=True,
            )
    return rows


if __name__ == "__main__":
    main()
