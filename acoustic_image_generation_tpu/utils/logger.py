"""Run logger: scalars / images / audio / histograms without TensorFlow.

Port of the capability of ``/root/reference/logger/logger.py`` (a 35-line
``tf.summary`` wrapper): scalars append to ``metrics.jsonl`` (greppable,
plotted by any tool), images render to PNG under ``media/``, audio to WAV,
histograms to summary stats in the jsonl record. The Trainer writes its
epoch records through the same jsonl, so one file carries the whole run.

In addition every record is mirrored into a real TensorBoard event file
(``events.out.tfevents.*``, written by ``utils/tb_events.py`` with no TF
dependency), so the reference's TensorBoard workflow keeps working
unchanged: ``tensorboard --logdir <log_dir>``.
"""

from __future__ import annotations

import json
import os
import time
import wave

import numpy as np

from acoustic_image_generation_tpu.utils import tb_events


class Logger:
    def __init__(self, log_dir: str, *, tb: bool = True):
        self.log_dir = log_dir
        self.media_dir = os.path.join(log_dir, "media")
        os.makedirs(self.media_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._tb = tb_events.EventFileWriter(log_dir) if tb else None

    def _write(self, record: dict) -> None:
        record.setdefault("time", time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def _tb_add(self, values: list[bytes], step: int) -> None:
        if self._tb is not None:
            self._tb.add_summary(values, step)

    def log_scalar(self, tag: str, value, step: int) -> None:
        self._write({"step": step, tag: float(value)})
        self._tb_add([tb_events.scalar_value(tag, float(value))], step)

    def log_scalars(self, values: dict, step: int) -> None:
        self._write({"step": step, **{k: float(v) for k, v in values.items()}})
        self._tb_add(
            [tb_events.scalar_value(k, float(v)) for k, v in values.items()], step
        )

    def log_histogram(self, tag: str, values, step: int) -> None:
        v = np.asarray(values).ravel()
        self._write({
            "step": step,
            f"{tag}/mean": float(v.mean()),
            f"{tag}/std": float(v.std()),
            f"{tag}/min": float(v.min()),
            f"{tag}/max": float(v.max()),
        })
        self._tb_add([tb_events.histogram_value(tag, v)], step)

    def log_image(self, tag: str, image, step: int, *, cmap: str | None = None) -> str:
        """image: (H, W), (H, W, 1) or (H, W, 3), floats in [0,1] or uint8."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        arr = np.asarray(image)
        if arr.ndim == 3 and arr.shape[-1] == 1:
            arr = arr[..., 0]
        path = os.path.join(self.media_dir, f"{tag.replace('/', '_')}_{step}.png")
        plt.imsave(path, np.clip(arr, 0, 1) if arr.dtype != np.uint8 else arr, cmap=cmap)
        self._write({"step": step, f"{tag}/image": os.path.relpath(path, self.log_dir)})
        with open(path, "rb") as f:
            self._tb_add([tb_events.image_value(tag, f.read())], step)
        return path

    def log_sound(self, tag: str, samples, step: int, sample_rate: int = 12288) -> str:
        path = os.path.join(self.media_dir, f"{tag.replace('/', '_')}_{step}.wav")
        data = np.asarray(samples)
        if data.dtype != np.int16:
            peak = max(np.abs(data).max(), 1e-9)
            data = (data / peak * 32767).astype(np.int16)
        with wave.open(path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sample_rate)
            w.writeframes(data.tobytes())
        self._write({"step": step, f"{tag}/audio": os.path.relpath(path, self.log_dir)})
        with open(path, "rb") as f:
            self._tb_add(
                [
                    tb_events.audio_value(
                        tag,
                        f.read(),
                        sample_rate=sample_rate,
                        length_frames=len(data),
                    )
                ],
                step,
            )
        return path

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
