"""Orbax checkpointing of the full training state.

Stores the same logical content as the reference's checkpoint.pth
(main_esvit.py:476-488): student, teacher, optimizer state, DINO centers,
and the step counter — as one PyTree. Save cadence mirrors the reference:
``checkpoint`` every epoch (overwritten) + a numbered keep every
``save_every_epochs`` (saveckp_freq). Resume restores everything including
centers, which the reference keeps in the loss module's buffers
(main_esvit.py:611,671-672).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from esvit_tpu.losses import DinoCenters
from esvit_tpu.train.step import TrainState

LATEST = "checkpoint"


def _to_pytree(state: TrainState) -> dict:
    return {
        "step": state.step,
        "student": state.student,
        "teacher": state.teacher,
        "opt_state": state.opt_state,
        "centers": {"center": state.centers.center,
                    "center_grid": state.centers.center_grid},
        "student_state": state.student_state,
        "teacher_state": state.teacher_state,
    }


def _from_pytree(tree: dict, like: TrainState) -> TrainState:
    return TrainState(
        step=tree["step"],
        student=tree["student"],
        teacher=tree["teacher"],
        opt_state=tree["opt_state"],
        centers=DinoCenters(center=tree["centers"]["center"],
                            center_grid=tree["centers"]["center_grid"]),
        student_state=tree.get("student_state", {}),
        teacher_state=tree.get("teacher_state", {}),
    )


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, state: TrainState, *, epoch: int,
             save_every_epochs: int = 0, force_named: bool = False) -> None:
        tree = _to_pytree(jax.device_get(state))
        self._ckptr.save(self._path(LATEST), tree, force=True)
        if force_named or (save_every_epochs and epoch % save_every_epochs == 0):
            name = f"checkpoint{epoch:04d}"
            self._ckptr.save(self._path(name), tree, force=True)
        self._ckptr.wait_until_finished()

    def restore(self, like: TrainState, name: str = LATEST
                ) -> Optional[TrainState]:
        path = self._path(name)
        if not os.path.isdir(path):
            return None
        tree = self._ckptr.restore(path, _to_pytree(like))
        return _from_pytree(tree, like)

    def has_checkpoint(self) -> bool:
        return os.path.isdir(self._path(LATEST))
