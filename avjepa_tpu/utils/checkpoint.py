"""Orbax checkpointing of the train-state pytree.

Replaces the reference's rank-0 torch.save of module/optimizer state dicts
(reference: app/avjepa/train.py:332-350). Resume restores the full state and
*derives* all schedules from ``state.step`` — no scheduler replay
(reference replays start_epoch * ipe scheduler steps, train.py:326-330).

Layout: <folder>/ckpt/<step>/...  with a 'latest' pointer retained, plus
optional tagged keeps every ``save_every_freq`` epochs.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False
        )
        self.mngr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, force: bool = False) -> None:
        if force and step in self.mngr.all_steps():
            # force means "this state wins": a rerun into the same folder
            # re-emits an existing step id, and Orbax raises
            # StepAlreadyExistsError rather than overwriting — drop the old
            # step first. delete() is a collective (primary host removes,
            # then a global sync barrier), so like save() it must be called
            # on ALL hosts — which this is, since save() already is.
            self.mngr.delete(step)
        self.mngr.save(step, args=ocp.args.StandardSave(state), force=force)
        self.mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        return self.mngr.restore(step, args=ocp.args.StandardRestore(state_like))

    def close(self) -> None:
        self.mngr.close()
