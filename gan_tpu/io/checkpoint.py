"""Orbax checkpointing of the whole train-state pytree.

Replaces the reference's whole-module pickles (/root/reference/train/
trainunits.py:58-76 — which couple checkpoints to class definitions,
SURVEY.md Appendix A.7) with state-based Orbax checkpoints of
{g_params, d_params, g/d optimizer slots, batch_stats, spectral u-vectors,
step}: framework-decoupled, async-capable, multi-host safe. Resume is
automatic-from-latest rather than filename-addressed manual
(trainunits.py:96-131).
"""

import os
from typing import Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state, wait: bool = False) -> None:
        self._mngr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, state_template, step: Optional[int] = None):
        """Restore into the structure (and shardings) of state_template."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        return self._mngr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def close(self) -> None:
        self._mngr.wait_until_finished()
        self._mngr.close()
