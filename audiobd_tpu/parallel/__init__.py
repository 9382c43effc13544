from audiobd_tpu.parallel.mesh import (
    batch_pspec,
    make_mesh,
    replicated_pspec,
    shard_batch,
    shard_replicated,
)

__all__ = [
    "make_mesh",
    "batch_pspec",
    "replicated_pspec",
    "shard_batch",
    "shard_replicated",
]
