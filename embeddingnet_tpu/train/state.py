"""TrainState: the full resumable training state as one pytree.

The reference's mutable Keras model + callbacks state becomes a single
functional pytree: params, optimizer state, batch-norm statistics, RNG key
and step counter — checkpointed atomically by
:mod:`embeddingnet_tpu.train.checkpoint` (the reference only saved weights,
``tools/train.py:87-90``, losing optimizer/epoch state on resume).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    batch_stats: Any
    rng: jax.Array
    step: jnp.ndarray

    @classmethod
    def create(cls, variables, optimizer: optax.GradientTransformation,
               rng: Optional[jax.Array] = None) -> "TrainState":
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return cls(params=params,
                   opt_state=optimizer.init(params),
                   batch_stats=batch_stats,
                   rng=rng if rng is not None else jax.random.PRNGKey(0),
                   step=jnp.zeros((), jnp.int32))

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v
