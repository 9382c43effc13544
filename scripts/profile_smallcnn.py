"""Per-op device-time breakdown of a smallcnn train epoch (VERDICT r2 item 5).

Runs one warmed + one traced scan epoch at the bench shape, then parses the
perfetto trace (plugins/profile/<run>/*.trace.json.gz — plain JSON, no
tensorboard needed) and aggregates device-stream op durations by fusion name.
The attribution decides whether blocks 2-3 get the single-pass Pallas
backward treatment or a measured "this is roofline" bound.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_smallcnn.py [dtype]
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

DTYPE = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
FUSED = os.environ.get("PROF_FUSED", "auto")
TRACE_DIR = os.environ.get("PROF_DIR", f"/tmp/prof_smallcnn_{DTYPE}_{FUSED}")
BATCH = int(os.environ.get("PROF_BATCH", 256))
N_CLIPS = int(os.environ.get("PROF_CLIPS", 20480))


def main():
    import jax
    import jax.numpy as jnp

    from audiobd_tpu.configs import make_config
    from audiobd_tpu.train.loop import ArraySet
    from audiobd_tpu.train.scan_epoch import (
        DeviceDataset, make_perm, make_train_epoch_fn, pad_plan,
    )
    from audiobd_tpu.train.state import TrainState
    from audiobd_tpu.models import jit_init
    from audiobd_tpu.train.trainer import build_attack_model, make_optimizer
    from audiobd_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache("auto")
    rng = np.random.default_rng(0)
    cfg = make_config(
        "badnets", model="smallcnn", batch_size=BATCH, compute_dtype=DTYPE,
        fused_conv_block=FUSED,
    )
    model = build_attack_model(cfg)
    tx = make_optimizer(cfg)
    data = ArraySet(
        rng.normal(size=(N_CLIPS, 1, 101, 40)).astype(np.float32),
        rng.integers(0, 10, N_CLIPS).astype(np.int64),
        (rng.random(N_CLIPS) < 0.1).astype(np.int64),
    )
    dset = DeviceDataset(data)
    variables = jit_init(model, jax.random.PRNGKey(0), data.feats[:1])
    state = TrainState.create(variables, tx)
    epoch_fn = make_train_epoch_fn(model, tx)
    n_batches, mask = pad_plan(dset.n, BATCH)
    perm = jnp.asarray(make_perm(np.random.default_rng(1), dset.n, n_batches, BATCH))
    mask = jnp.asarray(mask)

    def run(state):
        state, losses, sums = epoch_fn(
            state, dset.feats, dset.labels, dset.indicators, perm, mask,
            jax.random.PRNGKey(1),
        )
        # device_get forces real sync on axon (block_until_ready does not)
        jax.device_get(losses[-1])
        return state

    state = run(state)  # compile + warm
    import time
    t0 = time.perf_counter()
    state = run(state)
    wall = time.perf_counter() - t0
    print(f"epoch wall {wall*1e3:.1f} ms, {N_CLIPS/wall:.0f} clips/s", flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    state = run(state)
    jax.profiler.stop_trace()
    report(TRACE_DIR, wall)


def report(trace_dir: str, wall: float):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print(f"no trace.json.gz under {trace_dir}")
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device streams: pid/tid names containing TPU/device; fall back to all
    # complete ('X') events that look like XLA ops.
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in names.items() if re.search(r"TPU|/device|XLA", n, re.I)}
    agg = defaultdict(float)
    count = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        dur = e.get("dur", 0) / 1e6  # us -> s
        name = e.get("name", "?")
        agg[name] += dur
        count[name] += 1
        total += dur
    print(f"trace: {path}")
    print(f"device time total {total*1e3:.1f} ms (epoch wall {wall*1e3:.1f} ms)")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{dur*1e3:9.2f} ms  x{count[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
