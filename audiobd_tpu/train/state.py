"""Training state pytree."""

from __future__ import annotations

import functools
from typing import Any

import flax.struct
import jax
import optax


@functools.lru_cache(maxsize=None)
def _jit_of(fn):
    return jax.jit(fn)


def jitted_opt_init(tx: optax.GradientTransformation, params):
    """``tx.init(params)`` as ONE compiled program.

    Eager optax init materializes zeros per leaf — 2-3 tiny remote
    compiles/dispatches per leaf over the axon tunnel (~1 s each cold,
    a round trip each warm). Cached per ``tx.init`` function identity so
    repeated calls reuse the traced program."""
    return _jit_of(tx.init)(params)


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array

    def device_copy(self) -> "TrainState":
        """Fresh on-device copy of every buffer, as one compiled program.

        Required before stashing a state across steps of a donating train
        step (donate_argnums deletes the input buffers on the next call) —
        e.g. early-stopping "best so far" holders.
        """
        return _device_copy_tree(self)

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation):
        import jax.numpy as jnp

        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return cls(
            params=params,
            batch_stats=batch_stats,
            opt_state=jitted_opt_init(tx, params),
            step=jnp.zeros((), jnp.int32),
        )


@jax.jit
def _device_copy_tree(tree):
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.copy, tree)
