"""Checkpoint / resume via Orbax.

Replaces ``torch.save`` of ``{iter, model_*_state_dict, optimizer_*_state_dict}``
(``/root/reference/train_model.py:248-263``) with an orbax checkpoint of the
whole :class:`~ddnerf_tpu.train.state.TrainState` pytree.  Contract parity:

* a single rolling checkpoint under ``logdir`` (the reference overwrites
  ``checkpoint.ckpt`` every ``save_every`` iters);
* the config is snapshotted to ``logdir/config.yml`` at train start and is
  the source of truth for eval/render (train_model.py:44-46, eval_nerf.py:22);
* resume restores params, optimizer state, and the step counter; the
  annealing state needs no special handling because schedules are pure
  functions of the restored step (unlike train_model.py:117-118's manual
  pdf_padding re-derivation).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from ddnerf_tpu.config import Config
from ddnerf_tpu.train.state import TrainState

CKPT_DIR = "checkpoint"


def save_config_snapshot(cfg: Config, logdir: str) -> None:
    os.makedirs(logdir, exist_ok=True)
    with open(os.path.join(logdir, "config.yml"), "w") as f:
        f.write(cfg.dump())


def load_config_snapshot(logdir: str) -> Config:
    return Config.from_yaml(os.path.join(logdir, "config.yml")).resolved()


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager.  Default keeps the
    reference's single-rolling-checkpoint behavior (max_to_keep=1);
    ``experiment.max_keep_ckpts`` raises the retention so eval can pick an
    earlier step (reference eval_nerf.py:173-178's ``--checkpoint``)."""

    def __init__(self, logdir: str, max_to_keep: int = 1):
        self.path = os.path.abspath(os.path.join(logdir, CKPT_DIR))
        os.makedirs(self.path, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.path,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, state: TrainState) -> None:
        step = int(state.step)
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return list(self._mgr.all_steps())

    def restore(self, abstract_state: TrainState,
                step: Optional[int] = None) -> TrainState:
        """Restore into the structure of ``abstract_state`` (an initialized
        TrainState provides the pytree/sharding template).  ``step`` selects a
        retained checkpoint (default: latest)."""
        if step is None:
            step = self._mgr.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoint under {self.path}")
        elif step not in self._mgr.all_steps():
            raise FileNotFoundError(
                f"checkpoint step {step} not under {self.path}; "
                f"available: {sorted(self._mgr.all_steps())}"
            )
        shapes = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, abstract_state
        )
        return self._mgr.restore(step, args=ocp.args.StandardRestore(shapes))

    def close(self) -> None:
        self._mgr.close()
