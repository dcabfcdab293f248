"""Checkpoint / resume via orbax.

The reference checkpoints three torch files per save epoch and restores by
regex-scanning for the newest *complete* generator/discriminator/optimizer
triple, walking back on partial writes (``models/GAN/train.py:90-129,
602-617``; SURVEY.md §5.4).  Orbax subsumes that discipline: saves are
atomic (staged directory + commit), so the newest step is always complete,
and ``latest_step`` is the ``find_latest_checkpoint`` equivalent.  One
checkpoint bundles params + optimizer state + batch/spectral-norm stats +
step + PRNG key.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional, Union

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """Thin wrapper over ``ocp.CheckpointManager`` for train-state pytrees."""

    def __init__(
        self,
        directory: Union[str, Path],
        max_to_keep: Optional[int] = None,
        save_interval_steps: int = 1,
    ):
        self._mgr = ocp.CheckpointManager(
            Path(directory).resolve(),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                create=True,
            ),
        )

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        """Save a pytree (dict of train states etc.) at ``step``.

        Idempotent: a step that is already checkpointed is skipped (the
        reference's end-of-training save can coincide with the last interval
        save, ``models/GAN/train.py:602-617``)."""
        if step in set(self._mgr.all_steps()):
            return False
        saved = self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)
        return bool(saved)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``template`` (an abstract or concrete
        pytree of the same shape), from ``step`` or the latest."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
