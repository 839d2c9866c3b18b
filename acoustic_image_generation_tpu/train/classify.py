"""Classification tasks: DualCamNet on real, tiled-MFCC, or *generated*
acoustic images.

- ``ClassificationTask``: ``Trainer_classification``
  (``/root/reference/trainer/trainer_class.py:28-56``) — DualCamNet over the
  real acoustic image (or the tiled mfccmap when ``mfccmap=True``), softmax
  CE over 12-frame-mean clip logits, accuracy-gated checkpoints.
- ``GeneratedClassificationTask``: ``Trainer_rec_class``
  (``trainer_reconstructed_class.py:28-76``) — a FROZEN ResNet50+UNetAcRes
  generator synthesizes acoustic images from (video, mfcc); only DualCamNet
  params receive updates (reference keeps generator vars out of
  ``var_list``, ``:61``), realized here via optax.multi_transform labels.
  Its twin evaluation "real vs generated accuracy in one graph"
  (``saveimagesresnet.py:68-120``) is ``evaluation.real_vs_generated``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acoustic_image_generation_tpu.core.config import ExperimentConfig
from acoustic_image_generation_tpu.data.preprocess import Batch
from acoustic_image_generation_tpu.losses import accuracy, softmax_cross_entropy
from acoustic_image_generation_tpu.models import DualCamNet
from acoustic_image_generation_tpu.models.dualcamnet import clip_logits
from acoustic_image_generation_tpu.models.unet_ac import tile_mfccmap
from acoustic_image_generation_tpu.train.generation import GenerationTask


class ClassificationTask:
    eval_metric = "accuracy"
    eval_mode = "max"

    def __init__(self, config: ExperimentConfig):
        self.cfg = config
        dt = jnp.bfloat16 if config.parallel.compute_dtype == "bfloat16" else jnp.float32
        self.num_frames = 12 * config.data.sample_length
        self.model = DualCamNet(
            num_classes=config.data.num_classes,
            num_frames=self.num_frames,
            channels=config.data.num_channels,
            dtype=dt,
        )

    def _inputs(self, batch: Batch):
        if self.cfg.model.mfccmap:
            return tile_mfccmap(batch.mfcc)
        return batch.acoustic

    def init_variables(self, rng, batch: Batch):
        variables = self.model.init({"params": rng}, self._inputs(batch))
        return {"dualcamnet": variables["params"]}, {}

    def _logits(self, params, batch: Batch):
        frame_logits = self.model.apply({"params": params["dualcamnet"]}, self._inputs(batch))
        return clip_logits(frame_logits.astype(jnp.float32), self.num_frames)

    def _labels(self, batch: Batch):
        """Per-clip one-hot labels from per-frame action ids (frames of a
        clip share the label; take every ``num_frames``-th)."""
        per_clip = batch.action[:: self.num_frames]
        return jax.nn.one_hot(per_clip, self.cfg.data.num_classes)

    def loss(self, params, batch_stats, batch: Batch, rngs, *, train: bool):
        del rngs, train
        logits = self._logits(params, batch)
        labels = self._labels(batch)
        ce = softmax_cross_entropy(labels, logits)
        acc = accuracy(logits, labels)
        return ce, {"loss": ce, "cross_loss": ce, "accuracy": acc}, batch_stats

    def eval_losses(self, params, batch_stats, batch: Batch, rngs):
        del rngs
        logits = self._logits(params, batch)
        labels = self._labels(batch)
        logp = jax.nn.log_softmax(logits, axis=-1)
        per_clip_ce = -jnp.sum(labels * logp, axis=-1)
        correct = (jnp.argmax(logits, 1) == jnp.argmax(labels, 1)).astype(jnp.float32)
        return {"cross_loss": per_clip_ce, "accuracy": correct}, logits


class GeneratedClassificationTask(ClassificationTask):
    """DualCamNet trained on generator output; generator frozen."""

    def __init__(self, config: ExperimentConfig):
        super().__init__(config)
        self.generation = GenerationTask(config)

    def init_variables(self, rng, batch: Batch):
        kg, kc = jax.random.split(rng)
        gen_params, gen_stats = self.generation.init_variables(kg, batch)
        fake = jnp.zeros_like(batch.acoustic)
        variables = self.model.init({"params": kc}, fake)
        params = {"dualcamnet": variables["params"], **gen_params}
        return params, gen_stats

    @staticmethod
    def param_labels(params):
        """optax.multi_transform labels: only DualCamNet trains."""
        return {k: ("train" if k == "dualcamnet" else "frozen") for k in params}

    def _generated(self, params, batch_stats, batch: Batch, rngs):
        out, _ = self.generation._forward(
            {"resnet": params["resnet"], "generator": params["generator"]},
            batch_stats,
            batch,
            rngs,
            train=False,
        )
        return out.output.astype(jnp.float32)

    def loss(self, params, batch_stats, batch: Batch, rngs, *, train: bool):
        del train
        generated = self._generated(params, batch_stats, batch, rngs)
        frame_logits = self.model.apply({"params": params["dualcamnet"]}, generated)
        logits = clip_logits(frame_logits.astype(jnp.float32), self.num_frames)
        labels = self._labels(batch)
        ce = softmax_cross_entropy(labels, logits)
        acc = accuracy(logits, labels)
        return ce, {"loss": ce, "cross_loss": ce, "accuracy": acc}, batch_stats

    def eval_losses(self, params, batch_stats, batch: Batch, rngs):
        generated = self._generated(params, batch_stats, batch, rngs)
        frame_logits = self.model.apply({"params": params["dualcamnet"]}, generated)
        logits = clip_logits(frame_logits.astype(jnp.float32), self.num_frames)
        labels = self._labels(batch)
        logp = jax.nn.log_softmax(logits, axis=-1)
        per_clip_ce = -jnp.sum(labels * logp, axis=-1)
        correct = (jnp.argmax(logits, 1) == jnp.argmax(labels, 1)).astype(jnp.float32)
        return {"cross_loss": per_clip_ce, "accuracy": correct}, logits


class CorrespondenceTask(ClassificationTask):
    """Audio-visual correspondence classification: DualCamNet(2) over the
    correspondence-augmented batch (real acoustic images labeled 1, tiled
    silence-MFCC fakes labeled 0 — ``outdoor_data_mfcc.py:888-928``; enable
    ``data.correspondence`` so the trainer doubles each batch).

    Padded remainder batches are handled: the trainer's eval mask is
    computed per concatenated half (``Trainer._eval_step_impl``), so the
    real-prefix of both the true and the fake half is counted and the
    padding in each is excluded.
    """

    def __init__(self, config: ExperimentConfig):
        assert config.data.correspondence, "enable data.correspondence"
        cfg = config
        super().__init__(cfg)
        dt = jnp.bfloat16 if cfg.parallel.compute_dtype == "bfloat16" else jnp.float32
        self.model = DualCamNet(
            num_classes=2,
            num_frames=self.num_frames,
            channels=cfg.data.num_channels,
            dtype=dt,
        )

    def _labels(self, batch: Batch):
        assert batch.correspondence is not None
        return batch.correspondence[:: self.num_frames]
