"""Functional train state: params + batch_stats + optimizer + step.

The TPU-native replacement for the reference's mutable trainer classes
(Train_model_frontend.py:18-117): everything that changes during
training is an explicit pytree, so a step is `state = step(state, batch)`
and sharding/checkpointing are mechanical.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )

    @property
    def variables(self):
        if self.batch_stats is None:
            return {"params": self.params}
        return {"params": self.params, "batch_stats": self.batch_stats}


def create_train_state(
    rng: jax.Array,
    model,
    example_inputs: tuple,
    tx: Optional[optax.GradientTransformation] = None,
    learning_rate: float = 1e-4,
    init_kwargs: Optional[dict] = None,
) -> TrainState:
    """Initialise model variables and optimizer (Adam lr=1e-4 is the
    reference default for both trainers: Train_model_frontend.py:301-305,
    superpoint_glue_train.py:80)."""
    tx = tx if tx is not None else optax.adam(learning_rate)
    # jitted init: eager flax init dispatches hundreds of op-by-op
    # compiles, which costs minutes through a device relay
    kwargs = init_kwargs or {}
    variables = jax.jit(lambda r, *a: model.init(r, *a, **kwargs))(
        rng, *example_inputs
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", None)
    return TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
