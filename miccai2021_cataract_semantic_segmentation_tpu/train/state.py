"""Train state: params + BN stats + optimiser, and its construction."""
from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            batch_stats=new_batch_stats,
                            opt_state=new_opt_state)


def make_optimizer(train_cfg: dict, schedule) -> optax.GradientTransformation:
    """Adam with the scheduled LR (BaseManager.py:439-469 uses Adam +
    LambdaLR; FCNManager uses ExponentialLR — covered by the schedule)."""
    name = train_cfg.get("optimizer", "adam").lower()
    wd = float(train_cfg.get("weight_decay", 0.0))
    if name == "adam":
        tx = optax.adam(schedule) if wd == 0 else optax.adamw(schedule, weight_decay=wd)
    elif name == "sgd":
        tx = optax.sgd(schedule, momentum=float(train_cfg.get("momentum", 0.9)))
    else:
        raise ValueError(f"optimizer '{name}' not recognised")
    clip = train_cfg.get("grad_clip")
    if clip:
        tx = optax.chain(optax.clip_by_global_norm(float(clip)), tx)
    return tx


def create_train_state(model, rng, sample_input, train_cfg: dict, schedule,
                       train: bool = False) -> TrainState:
    variables = model.init({"params": rng, "points": rng, "dropout": rng},
                           sample_input, train)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(train_cfg, schedule)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats,
                      opt_state=tx.init(params),
                      apply_fn=model.apply, tx=tx)
