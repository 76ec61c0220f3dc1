"""Orbax checkpointing: every-epoch saves, resume, eval restore.

Capability parity with Lightning's `ModelCheckpoint(every_n_epochs=1,
save_top_k=-1)` + `trainer.fit(..., ckpt_path=...)` resume
(/root/reference/train.py:334,341): keep every epoch, restore full
model/optimizer/epoch state. Saves are async (the TPU keeps training while
the previous epoch's state streams to disk) — a capability the reference
lacks.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, epoch: int, state: Any, overwrite: bool = False) -> None:
        """`overwrite=True` replaces an existing epoch — needed when a
        preempted epoch is replayed after resume (Orbax otherwise raises
        StepAlreadyExistsError; it has no in-place overwrite).

        The old checkpoint is renamed aside (not deleted) until the
        replacement has fully committed, so a crash or second preemption
        mid-replace never leaves the step without any checkpoint — the
        aside copy is restored on failure."""
        if overwrite and epoch in (self._mgr.all_steps() or ()):
            self._mgr.wait_until_finished()
            step_dir = os.path.join(self.directory, str(epoch))
            backup = step_dir + ".replacing"
            if os.path.isdir(step_dir):
                import shutil

                if os.path.isdir(backup):  # stale aside from an old crash
                    shutil.rmtree(backup)
                os.rename(step_dir, backup)
                self._mgr.reload()
                try:
                    self._mgr.save(epoch, args=ocp.args.StandardSave(state))
                    self._mgr.wait_until_finished()
                except Exception:
                    if os.path.isdir(step_dir):
                        shutil.rmtree(step_dir)
                    os.rename(backup, step_dir)
                    self._mgr.reload()
                    raise
                shutil.rmtree(backup)
                return
            self._mgr.delete(epoch)  # registry entry with no dir on disk
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))

    def restore(self, state_template: Any, epoch: Optional[int] = None) -> Any:
        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def save_params_npz(path: str, params: Any) -> None:
    """Portable flat .npz export of a param pytree (for bench/demo use)."""
    import numpy as np

    flat = {
        "/".join(str(k.key) for k in p): np.asarray(v)
        for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    np.savez(path, **flat)


def load_params_npz(path: str) -> Any:
    import numpy as np

    data = np.load(path)
    tree: dict = {}
    for key in data.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return tree
