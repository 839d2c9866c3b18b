"""Single-modality VAE reconstruction task (the reference's plain
``Trainer``, ``/root/reference/trainer/trainer.py:15-89``): one UNet VAE on
the modality chosen by ``encoder_type`` (``main.py:288-296``):

- ``Ac``     -> UNetAcoustic on the 36x48x12 acoustic image
- ``Energy`` -> UNetEnergy on the 36x48x1 first-channel map
  (``trainer_three.py:450-451`` slices channel 0 as "logenergy",
  min-max normalized per frame :40-41)
- ``Audio``  -> UNetSound (small) on the per-second 99x257 spectrogram
- ``Video``  -> UNetVideo on 224x298 frames

Loss = MSE + Huber + KL/1e6 + weight-decay regs (``trainer.py:58-75``; the
KL division by 1e6 at :73 is the reference's fixed latent weight here).
"""

from __future__ import annotations

import jax.numpy as jnp

from acoustic_image_generation_tpu.core.config import ExperimentConfig
from acoustic_image_generation_tpu.data.preprocess import Batch, minmax_frame
from acoustic_image_generation_tpu.dsp.spectrogram import stft_magnitude
from acoustic_image_generation_tpu.losses import (
    huber_tf,
    kl_diag_gaussian,
    l2_regularization,
    mse_tf,
)
from acoustic_image_generation_tpu.models import (
    UNetAcoustic,
    UNetEnergy,
    UNetSound,
    UNetVideo,
)

_WEIGHT_DECAY = {"Ac": 0.0, "Energy": 1e-6, "Audio": 6e-5, "Video": 7e-5}


class ReconstructTask:
    eval_metric = "mse"
    eval_mode = "min"

    def __init__(self, config: ExperimentConfig):
        self.cfg = config
        self.encoder_type = config.model.encoder_type
        dt = jnp.bfloat16 if config.parallel.compute_dtype == "bfloat16" else jnp.float32
        if self.encoder_type == "Ac":
            self.model = UNetAcoustic(channels=config.data.num_channels, dtype=dt)
            self.has_bn = False
        elif self.encoder_type == "Energy":
            # BN-less: the reference comments BN out in this file
            # (unet_architecture_energy.py:157-158,171-172)
            self.model = UNetEnergy(dtype=dt)
            self.has_bn = False
        elif self.encoder_type == "Audio":
            self.model = UNetSound(variant="small", dtype=dt)
            self.has_bn = True
        elif self.encoder_type == "Video":
            self.model = UNetVideo(dtype=dt)
            self.has_bn = True
        else:
            raise ValueError(f"unknown encoder_type {self.encoder_type!r}")

    def _inputs(self, batch: Batch) -> jnp.ndarray:
        if self.encoder_type == "Ac":
            return batch.acoustic
        if self.encoder_type == "Energy":
            e = batch.acoustic[..., :1]
            return minmax_frame(e, axes=(-3, -2))
        if self.encoder_type == "Audio":
            wav = batch.audio.reshape(-1, 12 * 1024)
            return stft_magnitude(wav)[..., None]  # (N, 99, 257, 1)
        return batch.video

    def init_variables(self, rng, batch: Batch):
        x = self._inputs(batch)[:1]
        if self.has_bn:
            v = self.model.init({"params": rng}, x, train=False)
            return {"model": v["params"]}, {"model": v.get("batch_stats", {})}
        v = self.model.init({"params": rng}, x)
        return {"model": v["params"]}, {}

    def _apply(self, params, batch_stats, x, rngs, *, train):
        variables = {"params": params["model"]}
        kwargs = dict(rngs={"latent": rngs["latent"]})
        if self.has_bn:
            variables["batch_stats"] = batch_stats["model"]
            if train:
                out, mut = self.model.apply(
                    variables, x, train=True, mutable=["batch_stats"], **kwargs
                )
                return out, {"model": mut["batch_stats"]}
            return self.model.apply(variables, x, train=False, **kwargs), batch_stats
        return self.model.apply(variables, x, **kwargs), batch_stats

    def loss(self, params, batch_stats, batch: Batch, rngs, *, train: bool):
        x = self._inputs(batch)
        out, new_stats = self._apply(params, batch_stats, x, rngs, train=train)
        recon = out.output.astype(jnp.float32)
        mse = mse_tf(x, recon)
        hub = huber_tf(x, recon)
        kl = jnp.mean(kl_diag_gaussian(out.mean, out.std)) / 1e6
        reg = l2_regularization(params["model"], _WEIGHT_DECAY[self.encoder_type])
        total = mse + hub + kl + reg
        return total, {"loss": total, "mse": mse, "huber": hub, "latent_loss": kl}, new_stats

    def eval_losses(self, params, batch_stats, batch: Batch, rngs):
        x = self._inputs(batch)
        out, _ = self._apply(params, batch_stats, x, rngs, train=False)
        recon = out.output.astype(jnp.float32)
        err = jnp.square(recon - x)
        per = jnp.mean(err, axis=tuple(range(1, err.ndim)))
        return {"mse": per}, recon
