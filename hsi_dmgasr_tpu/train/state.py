"""Train state: params + Adam + optional EMA + norm batch stats.

Replaces the reference's torch lifecycle state (model/model.py:36-59):
the optimizer is optax.adam with the config lr (train.optimizer.lr), and
the declared-but-unused ema_scheduler (config sr_sr3_16_128.json:124-128)
is implemented for real behind ``ema_decay``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any = None
    ema_params: Any = None

    def apply_gradients(self, tx, grads, new_batch_stats=None, ema_decay=None):
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None and ema_decay is not None:
            new_ema = jax.tree.map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                new_ema, new_params,
            )
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
            ema_params=new_ema,
        )


def create_train_state(variables, tx, use_ema=False):
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=variables.get("batch_stats"),
        ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
    )
