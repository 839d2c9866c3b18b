"""Checkpointing + best-epoch bookkeeping.

Mirrors the reference artifact layout (``{checkpoint_dir}/{exp_name}/``):
``epoch_{N}.ckpt`` files (``/root/reference/trainer/mfcctrainer.py:400-406``),
best epoch + loss recorded in ``model.txt`` (``:389-395``, re-read by the
bash sweeps via grep, ``scripts/test.bash:12-14``), every-10-epochs snapshots
plus the best (``:379-388``), ``configuration.txt`` written by the config
object. Serialization is flax msgpack of the state pytree — single file,
restorable into a freshly initialized state of identical structure.
"""

from __future__ import annotations

import json
import os
from datetime import datetime

import flax.serialization
import jax

from acoustic_image_generation_tpu.train.state import TrainState


def save_checkpoint(run_dir: str, name, state: TrainState) -> str:
    os.makedirs(run_dir, exist_ok=True)
    path = os.path.join(run_dir, f"epoch_{name}.ckpt")
    state = jax.device_get(state)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(state))
    return path


def save_resume_meta(ckpt_path: str, *, epoch: int, step_in_epoch: int) -> str:
    """Sidecar for crash checkpoints: the exact position inside the epoch,
    so Trainer.fit can resume at the interrupted batch without guessing the
    original run's epoch geometry."""
    path = ckpt_path + ".meta.json"
    with open(path, "w") as f:
        json.dump({"epoch": int(epoch), "step_in_epoch": int(step_in_epoch)}, f)
    return path


def load_resume_meta(ckpt_path: str) -> dict | None:
    try:
        with open(ckpt_path + ".meta.json") as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into ``template`` (a freshly built state providing the pytree
    structure, like the reference's build-then-Saver.restore flow)."""
    with open(path, "rb") as f:
        data = f.read()
    return flax.serialization.from_bytes(template, data)


def restore_params(path: str, template_params):
    """Partial restore: params only (the reference's resume flow explicitly
    excludes Adam/momentum slots, ``trainer/trainer.py:140-161``)."""
    with open(path, "rb") as f:
        data = f.read()
    state_dict = flax.serialization.msgpack_restore(data)
    return flax.serialization.from_state_dict(template_params, state_dict["params"])


class BestTracker:
    """Best-validation-metric gate + ``model.txt`` writer.

    ``mode='min'`` for losses (``mfcctrainer.py:383``), ``mode='max'`` for
    accuracies (``trainer_class.py`` accuracy gate)."""

    def __init__(self, run_dir: str, exp_name: str, mode: str = "min"):
        self.run_dir = run_dir
        self.exp_name = exp_name
        self.mode = mode
        self.best_epoch = -1
        self.best_loss = float("inf") if mode == "min" else float("-inf")

    def update(self, epoch: int, loss: float) -> bool:
        """True (and records) iff this epoch's validation metric is a new
        best (<= / >=, like the reference's ``total_loss <= best_loss``)."""
        better = loss <= self.best_loss if self.mode == "min" else loss >= self.best_loss
        if better:
            self.best_epoch = epoch
            self.best_loss = loss
            os.makedirs(self.run_dir, exist_ok=True)
            with open(os.path.join(self.run_dir, "model.txt"), "w") as f:
                f.write(
                    f"{datetime.now()}: {self.exp_name}\n"
                    f"Best Epoch: {epoch}\n"
                    f"Validation_mse_Loss: {loss:6f}\n"
                )
            return True
        return False

    @staticmethod
    def read_best_epoch(run_dir: str) -> int:
        """Parse ``model.txt`` like ``scripts/test.bash:12-14`` does."""
        with open(os.path.join(run_dir, "model.txt")) as f:
            for line in f:
                if line.startswith("Best Epoch:"):
                    return int(line.split(":")[1])
        raise ValueError(f"no best epoch recorded in {run_dir}/model.txt")


class MetricsWriter:
    """Append-only jsonl metric log (the framework's TensorBoard-free
    counterpart of ``logger/logger.py``)."""

    def __init__(self, run_dir: str):
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, "metrics.jsonl")

    def write(self, record: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
