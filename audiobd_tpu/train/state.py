"""Training state pytree."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation):
        import jax.numpy as jnp

        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return cls(
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )
