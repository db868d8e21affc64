"""Pure per-step schedules.

The reference *mutates its config object* during training: the annealed
``gaussian_smooth_factor``, the ``pdf_padding`` flip at ``max_pdf_pad_iters``,
and the hardcoded mip-NeRF log-lerp learning rate
(``/root/reference/train_model.py:101-142``).  Under JAX, mutation is replaced
by pure functions of the step counter, evaluated inside the jitted train step
— which also makes checkpoint-resume trivially reproduce mid-anneal state
(cf. train_model.py:117-118).

All functions accept either python ints or traced jnp scalars for ``step``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ddnerf_tpu.config import Config


def learning_rate_decay(
    step, lr_init, lr_final, max_steps, lr_delay_steps=0, lr_delay_mult=1.0
):
    """mip-NeRF log-lerp decay with sine warmup
    (reference nerf_helpers.py:211-245)."""
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1.0 - t) + jnp.log(lr_final) * t)
    return delay_rate * log_lerp


def make_lr_schedule(cfg: Config):
    """The schedule the reference hardcodes at train_model.py:101-107."""
    opt = cfg.optimizer

    def schedule(step):
        return learning_rate_decay(
            step,
            lr_init=opt.lr_init,
            lr_final=opt.lr_final,
            max_steps=cfg.experiment.train_iters,
            lr_delay_steps=opt.lr_delay_steps,
            lr_delay_mult=opt.lr_delay_mult,
        )

    return schedule


def gaussian_smooth_factor(step, cfg: Config):
    """Linear anneal from ``gaussian_smooth_factor`` to ``final_smooth`` over
    ``finnish_smooth`` steps, then constant (train_model.py:121-138)."""
    tp = cfg.train_params
    dsmooth = (tp.gaussian_smooth_factor - tp.final_smooth) / tp.finnish_smooth
    step = jnp.asarray(step, jnp.float32)
    annealed = tp.gaussian_smooth_factor - dsmooth * step
    return jnp.where(step < tp.finnish_smooth, annealed, tp.final_smooth)


def pdf_padding(step, cfg: Config):
    """True until ``max_pdf_pad_iters`` then False (train_model.py:140-142).

    Returned as a traced bool so the flip does not recompile the train step.
    A config that starts with ``pdf_padding: False`` never pads (the reference
    only ever flips the configured value off, never on).
    """
    return jnp.logical_and(
        cfg.train_params.pdf_padding,
        jnp.asarray(step) < cfg.train_params.max_pdf_pad_iters,
    )
