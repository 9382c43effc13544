"""Device mesh + sharding helpers.

The reference is strictly single-device (``"cuda" if available else "cpu"``,
utils/models.py:13; no torch.distributed anywhere). Here parallelism is
first-class: a 2-axis ``('data', 'model')`` mesh, batches sharded on
``data``, parameters replicated (the KWS models are ≤ a few M params — DP is
the real strategy; the ``model`` axis exists so tensor-parallel layouts can
be annotated without restructuring). Gradient all-reduce is inserted by
GSPMD from the sharding annotations — jnp.mean over a sharded batch axis
*is* the psum over ICI; no hand-written collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = -1, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_dev = len(devices)
    if n_data == -1:
        n_data = n_dev // n_model
    assert n_data * n_model <= n_dev, (n_data, n_model, n_dev)
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def batch_pspec() -> P:
    return P("data")


def replicated_pspec() -> P:
    return P()


def shard_batch(mesh: Mesh, batch):
    """Put a pytree of batch arrays onto the mesh, sharded on dim 0."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def shard_replicated(mesh: Mesh, tree):
    """Replicate a pytree (params / opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_params_tp(mesh: Mesh, tree, min_features: int = 128):
    """Tensor-parallel layout: shard large dense kernels' output axis (and
    4-D conv kernels' output channels) over the 'model' mesh axis; replicate
    everything else. GSPMD propagates the layout through the train step and
    inserts the activation collectives. With n_model == 1 this is equivalent
    to replication."""
    import jax.numpy as jnp

    n_model = mesh.shape["model"]

    def place(x):
        x = x if hasattr(x, "ndim") else jnp.asarray(x)
        if (
            x.ndim >= 2
            and x.shape[-1] >= min_features
            and x.shape[-1] % n_model == 0
        ):
            spec = P(*([None] * (x.ndim - 1) + ["model"]))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, tree)
