"""Multi-host (multi-slice / DCN) initialization and data-sharding policy.

The reference is single-process, single-device (utils/models.py:13; no
torch.distributed anywhere — SURVEY.md §2.5), so nothing here has a reference
counterpart; this is the framework's own scaling story beyond one host:

* **Mesh-over-hosts policy.** The global mesh keeps its 2 axes. The 'data'
  axis spans *all* processes — gradient all-reduce for the leading (data)
  axis tolerates DCN latency because it happens once per step on a few MB of
  grads. The 'model' axis must stay *within* a slice so activation
  collectives ride ICI. With ``jax.make_mesh`` + the default device order,
  devices enumerate process-major, so axis order ('data', 'model') with
  n_model ≤ devices-per-process satisfies this automatically.
* **Per-process input pipeline.** Each process feeds only its shard of every
  global batch (`host_shard`); `jax.make_array_from_process_local_data`
  assembles the logically-global array. Shard assignment is by
  ``jax.process_index()`` so restarts are deterministic.

On a single host everything below is a no-op / identity, keeping one code
path for 1-chip dev runs and multi-slice deployment.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


def maybe_initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """``jax.distributed.initialize`` iff a multi-process environment is
    configured; returns True when distributed mode is live.

    Detection: explicit args win; otherwise standard cluster env vars
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``,
    or a TPU pod environment where jax auto-detects). Single-host runs
    return False without touching jax state.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None
    )
    env_pid = os.environ.get("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None
    )
    if coordinator_address is None and num_processes is None:
        return False  # single-host: nothing to initialize
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


@dataclass(frozen=True)
class HostShard:
    """This process's contiguous slice of a globally-indexed dataset."""

    start: int
    stop: int

    def __len__(self) -> int:
        return self.stop - self.start

    def indices(self):
        import numpy as np

        return np.arange(self.start, self.stop)


def host_shard(n: int, process_index: int | None = None, process_count: int | None = None) -> HostShard:
    """Deterministic contiguous shard of ``n`` examples for this process.

    The first ``n % P`` processes take one extra example, so every example is
    owned by exactly one process and shard sizes differ by at most one —
    wrap-pad batching (train/loop.py) already masks ragged tails.
    """
    if process_index is None or process_count is None:
        import jax

        process_index = jax.process_index() if process_index is None else process_index
        process_count = jax.process_count() if process_count is None else process_count
    assert 0 <= process_index < process_count, (process_index, process_count)
    base, extra = divmod(n, process_count)
    start = process_index * base + min(process_index, extra)
    stop = start + base + (1 if process_index < extra else 0)
    return HostShard(start, stop)


def global_batch_from_local(mesh, local_batch):
    """Assemble a logically-global, 'data'-sharded batch from each process's
    local rows (identity-cost on a single host).

    Under pjit/GSPMD the step function sees the global shape; XLA keeps each
    row on the process that produced it, so no cross-DCN data movement
    happens at input time.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), local_batch
    )
