"""Multi-host policy tests (single-process simulation of the sharding math
plus the global-batch assembly path on the virtual 8-device mesh)."""

import numpy as np

from audiobd_tpu.parallel.distributed import (
    global_batch_from_local,
    host_shard,
    maybe_initialize_distributed,
)
from audiobd_tpu.parallel.mesh import make_mesh


def test_host_shard_partitions_exactly():
    for n in (0, 1, 7, 64, 1001):
        for p_count in (1, 2, 3, 8):
            shards = [host_shard(n, i, p_count) for i in range(p_count)]
            # covers [0, n) exactly, in order, sizes differ by ≤1
            assert shards[0].start == 0 and shards[-1].stop == n
            for a, b in zip(shards, shards[1:]):
                assert a.stop == b.start
            sizes = [len(s) for s in shards]
            assert max(sizes) - min(sizes) <= 1
            assert sum(sizes) == n


def test_host_shard_uses_jax_process_info():
    # Single-process jax: process 0 of 1 owns everything.
    s = host_shard(10)
    assert (s.start, s.stop) == (0, 10)
    assert s.indices().tolist() == list(range(10))


def test_maybe_initialize_distributed_noop_on_single_host(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert maybe_initialize_distributed() is False


def test_global_batch_from_local_single_host():
    # On one host the local rows ARE the global batch; the assembled array
    # must be 'data'-sharded over the mesh with unchanged contents.
    mesh = make_mesh(n_data=8, n_model=1)
    local = {"x": np.arange(32, dtype=np.float32).reshape(16, 2)}
    out = global_batch_from_local(mesh, local)
    assert out["x"].shape == (16, 2)
    np.testing.assert_array_equal(np.asarray(out["x"]), local["x"])
    assert "data" in str(out["x"].sharding.spec)
