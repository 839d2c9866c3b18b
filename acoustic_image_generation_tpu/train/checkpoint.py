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

import concurrent.futures as cf
import json
import os
from datetime import datetime

import flax.serialization
import jax
import jax.numpy as jnp

from acoustic_image_generation_tpu.train.state import TrainState


def save_checkpoint(run_dir: str, name, state: TrainState) -> str:
    os.makedirs(run_dir, exist_ok=True)
    path = os.path.join(run_dir, f"epoch_{name}.ckpt")
    state = jax.device_get(state)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(state))
    return path


class AsyncCheckpointer:
    """Overlap checkpoint IO with training (the reference's Saver.save
    blocks the epoch loop; here the device->host gather + msgpack + file
    write run on a background thread).

    Donation-safe by construction: ``save`` first snapshots the state into
    fresh device buffers (an on-device copy, dispatched asynchronously —
    microseconds of host time), so the epoch loop is free to donate the
    original buffers to the next train step while the writer thread
    gathers the snapshot. One save is in flight at a time; a second
    ``save`` first waits for (and surfaces errors from) the previous one.
    ``close()`` makes every accepted save durable — call it before
    restoring or returning."""

    def __init__(self) -> None:
        self._pool = cf.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="aig-ckpt"
        )
        self._pending: cf.Future | None = None

    def save(self, run_dir: str, name, state: TrainState) -> str:
        snapshot = jax.tree_util.tree_map(jnp.copy, state)
        self.wait()
        os.makedirs(run_dir, exist_ok=True)
        path = os.path.join(run_dir, f"epoch_{name}.ckpt")

        def _write() -> None:
            host = jax.device_get(snapshot)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(flax.serialization.to_bytes(host))
            os.replace(tmp, path)  # a checkpoint file is never half-written

        self._pending = self._pool.submit(_write)
        return path

    def wait(self) -> None:
        """Block until the in-flight save (if any) is durable; re-raises
        any writer-thread error."""
        if self._pending is not None:
            pending, self._pending = self._pending, None
            pending.result()

    def close(self) -> None:
        self.wait()
        self._pool.shutdown()


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
