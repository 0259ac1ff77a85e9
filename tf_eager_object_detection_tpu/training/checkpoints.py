"""Checkpoint save/restore via orbax.

Replaces the reference's eager `Saver` flow (scripts/train.py:178-187): save
every N steps, restore precedence CLI path -> latest in dir. Unlike the
reference (global step not restored, README.md:75), the full TrainState
(params, optimizer state, step) round-trips.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from tf_eager_object_detection_tpu.training.train_step import TrainState

__all__ = ["CheckpointManager", "save_params", "load_params"]


class CheckpointManager:
    """Thin orbax CheckpointManager wrapper keyed by step."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, state: TrainState):
        step = int(state.step)
        if step in (self._mgr.all_steps() or []):
            return  # e.g. epoch-end save right after an interval save
        self._mgr.save(
            step, args=ocp.args.StandardSave(_to_pytree(state)), force=True
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        """Shut down orbax's background threads (they otherwise keep the
        interpreter alive after training finishes)."""
        self._mgr.close()

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into the structure of `state` (params/opt must match)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return state
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(_to_pytree(state))
        )
        return TrainState(
            restored["params"], restored["opt_state"], restored["step"]
        )


def _to_pytree(state: TrainState) -> dict:
    return {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }


def save_params(path: str, params) -> None:
    """Standalone params-only save (eval / export), .npz flat format."""
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(params, sep="/")
    np.savez(path, **{k: np.asarray(v) for k, v in flat.items()})


def load_params(path: str):
    """Load params saved by save_params."""
    from flax.traverse_util import unflatten_dict

    data = np.load(path)
    flat = {k: data[k] for k in data.files}
    return jax.tree_util.tree_map(
        np.asarray, unflatten_dict(flat, sep="/")
    )
