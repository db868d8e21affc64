"""Train state: parameters + optimizer + step counter as one pytree.

Replaces the reference's mutable torch module + two Adam optimizers
(``/root/reference/train_model.py:84-98``).  The reference runs one Adam per
network with an identical, externally-set learning rate each step
(train_model.py:146-150); Adam is elementwise, so a single optax Adam over the
combined ``{coarse, fine}`` pytree with the same schedule is exactly
equivalent — and keeps the whole update inside one jitted step.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import optax

from ddnerf_tpu.config import Config
from ddnerf_tpu.core.schedules import make_lr_schedule
from ddnerf_tpu.models.nerf import NerfPipeline


@flax.struct.dataclass
class TrainState:
    step: jax.Array  # int32 scalar
    params: Dict[str, Any]
    opt_state: Any
    rng: jax.Array  # PRNG key, folded with step each iteration


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam + the mip-NeRF log-lerp LR schedule (train_model.py:101-107).

    ``optax.scale_by_learning_rate`` consumes the schedule per-step, replacing
    the reference's per-iteration mutation of every param group's lr."""
    lr = make_lr_schedule(cfg)
    if cfg.optimizer.type.lower() != "adam":
        raise ValueError(f"unsupported optimizer {cfg.optimizer.type!r}")
    return optax.chain(
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(lr),
    )


def create_train_state(cfg: Config, pipeline: NerfPipeline, rng) -> TrainState:
    r_init, r_train = jax.random.split(rng)
    params = pipeline.init_params(r_init)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    import jax.numpy as jnp

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        rng=r_train,
    )


def param_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
