"""Checkpoint / resume: atomic full-train-state snapshots via Orbax.

The reference checkpoints weights only (``ModelCheckpoint`` .hdf5,
``tools/train.py:87-90``) — resume loses the optimizer moments, LR plateau
state, epoch counter and RNG. Here the entire :class:`TrainState` plus
host-side loop state (epoch, best metric, plateau scale) round-trips, with
Orbax's atomic write protocol preventing torn checkpoints on preemption
(SURVEY.md §5 failure-detection gap).
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from embeddingnet_tpu.train.state import TrainState


class CheckpointManager:
    """Best-only + periodic checkpoints under ``<work_dir>/weights/``
    (the reference's weight-dir layout, ``tools/train.py:35,41``)."""

    def __init__(self, directory: str, max_to_keep: int = 5,
                 save_best_only: bool = True, monitor: str = "val_loss",
                 mode: str = "min", async_save: bool = False):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_best_only = save_best_only
        self.monitor = monitor
        self.mode = mode
        # async_save: let Orbax's background thread finish the write
        # while training continues (PERFORMANCE.async_checkpoint);
        # close()/restore() still synchronize, so no torn reads
        self.async_save = async_save
        self.best: Optional[float] = None
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def _improved(self, value: float) -> bool:
        if self.best is None:
            return True
        return value < self.best if self.mode == "min" else value > self.best

    def save(self, epoch: int, state: TrainState, metrics: dict,
             host_state: Optional[dict] = None) -> bool:
        """Save if improved (or always when ``save_best_only=False``).
        Returns True when a checkpoint was written."""
        raw = metrics.get(self.monitor)
        if raw is None and self.mode == "min":
            raw = metrics.get("loss")  # reference fallback
        if raw is None:
            # monitored metric absent this epoch (e.g. recall evaluated
            # every N epochs): nothing to compare — never "improves"
            if self.save_best_only:
                return False
            value = None
        else:
            value = float(raw)
        if value is not None:
            if self.save_best_only and not self._improved(value):
                return False
            if self._improved(value):
                self.best = value
        host = {"epoch": epoch, "best": self.best,
                "metrics": {k: float(v) for k, v in metrics.items()},
                **(host_state or {})}
        self._mgr.save(epoch, args=ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            host=ocp.args.JsonSave(host)))
        if not self.async_save:
            self._mgr.wait_until_finished()
        return True

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: TrainState,
                epoch: Optional[int] = None):
        """Restore ``(state, host_state)``; ``epoch=None`` -> latest."""
        self._mgr.wait_until_finished()  # drain any in-flight async save
        epoch = epoch if epoch is not None else self._mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(
                f"no checkpoints under {self.directory}")
        restored = self._mgr.restore(epoch, args=ocp.args.Composite(
            state=ocp.args.StandardRestore(state_template),
            host=ocp.args.JsonRestore()))
        host = restored["host"]
        self.best = host.get("best")
        return restored["state"], host

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_encodings_pickle(encoded_training_data: dict, save_folder: str,
                          save_file_name: str = "encodings.pkl") -> str:
    """Reference encodings-pickle contract (``models.py:86-90``)."""
    import pickle
    os.makedirs(save_folder, exist_ok=True)
    path = os.path.join(save_folder, save_file_name)
    with open(path, "wb") as f:
        pickle.dump(encoded_training_data, f)
    return path


def create_save_folders(params_general) -> dict:
    """The reference work-dir tree (``tools/train.py:33-50``)."""
    work_dir_path = os.path.join(params_general["work_dir"],
                                 params_general["project_name"])
    paths = {
        "work_dir": work_dir_path,
        "weights": os.path.join(work_dir_path, "weights/"),
        "pretraining_weights": os.path.join(
            work_dir_path, "pretraining_model/weights/"),
        "encodings": os.path.join(work_dir_path, "encodings/"),
        "plots": os.path.join(work_dir_path, "plots/"),
        "tensorboard": os.path.join(work_dir_path, "tf_log/"),
        "pretraining_tensorboard": os.path.join(
            work_dir_path, "pretraining_model/tf_log/"),
    }
    for p in paths.values():
        os.makedirs(p, exist_ok=True)
    return paths
