"""Projection task: translate frozen per-modality VAE latents into the
acoustic latent space and decode acoustic images from them.

Port of ``TrainerProject`` (``/root/reference/trainer/trainer_proietta.py:
32-135``): pretrained modality VAEs are FROZEN; only the associator(s)
train (``var_list`` at :96/:134 holds associator vars only). Wiring per
flags:

- ``encoder_type=Video``: video VAE -> LatentAssociator(video->ac)
- ``encoder_type=Audio``: audio spectrogram -> AssociatorAudioEncoder
- ``fusion``: both associators, averaged (mean, std) (:46-56)

The acoustic UNet decodes from the translated latent (``unet_z.py``
external-latent mode). Loss = acoustic MSE + Huber + KL(associator)/1e6 +
[l2 latent alignment to the acoustic VAE's own (mean,std) | all-triplets
on z's drawn with one shared noise] (:79-96).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acoustic_image_generation_tpu.core.config import ExperimentConfig
from acoustic_image_generation_tpu.data.preprocess import Batch
from acoustic_image_generation_tpu.dsp.spectrogram import stft_magnitude
from acoustic_image_generation_tpu.losses import (
    huber_tf,
    kl_diag_gaussian,
    l2_regularization,
    mse_tf,
    triplet_all,
)
from acoustic_image_generation_tpu.models import UNetAcoustic, UNetSound, UNetVideo
from acoustic_image_generation_tpu.models.associators import (
    AUDIO_AC_HIDDEN,
    VIDEO_AC_HIDDEN,
    AssociatorAudioEncoder,
    LatentAssociator,
)

SAMPLES_PER_SECOND = 12 * 1024


class ProjectTask:
    eval_metric = "mse"
    eval_mode = "min"

    def __init__(self, config: ExperimentConfig):
        self.cfg = config
        dt = jnp.bfloat16 if config.parallel.compute_dtype == "bfloat16" else jnp.float32
        self.dt = dt
        self.fusion = config.model.fusion
        self.encoder_type = config.model.encoder_type
        self.acoustic = UNetAcoustic(channels=config.data.num_channels, dtype=dt)
        self.video = UNetVideo(latent_dim=1024, dtype=dt)
        self.audio = UNetSound(variant="large", latent_dim=256, dtype=dt)
        self.assoc_video = LatentAssociator(VIDEO_AC_HIDDEN, dtype=dt)
        self.assoc_audio = LatentAssociator(AUDIO_AC_HIDDEN, dtype=dt)
        # non-fusion Audio path uses the conv encoder variant (main.py:188)
        self.assoc_audio_enc = AssociatorAudioEncoder(dtype=dt)

    # --------------------------------------------------------------- inputs

    def _inputs(self, batch: Batch):
        ac = batch.acoustic[::12]
        video = batch.video[::12]
        wav = batch.audio.reshape(-1, SAMPLES_PER_SECOND)
        spec = stft_magnitude(wav)
        spec = jax.image.resize(spec, (spec.shape[0], 193, 257), method="bilinear")
        return ac, spec[..., None], video

    # ----------------------------------------------------------------- init

    def init_variables(self, rng, batch: Batch):
        ks = jax.random.split(rng, 6)
        ac, spec, video = self._inputs(batch)
        av = self.acoustic.init({"params": ks[0], "latent": ks[5]}, ac[:1])
        vv = self.video.init({"params": ks[1], "latent": ks[5]}, video[:1], train=False)
        sv = self.audio.init({"params": ks[2], "latent": ks[5]}, spec[:1], train=False)
        params = {
            "acoustic": av["params"],
            "video": vv["params"],
            "audio": sv["params"],
        }
        stats = {"video": vv["batch_stats"], "audio": sv["batch_stats"]}
        if self.fusion or self.encoder_type == "Video":
            params["assoc_video"] = self.assoc_video.init(
                {"params": ks[3]}, jnp.zeros((1, 1024)), jnp.zeros((1, 1024))
            )["params"]
        if self.fusion:
            params["assoc_audio"] = self.assoc_audio.init(
                {"params": ks[4]}, jnp.zeros((1, 256)), jnp.zeros((1, 256))
            )["params"]
        elif self.encoder_type != "Video":
            ev = self.assoc_audio_enc.init({"params": ks[4]}, spec[:1], train=False)
            params["assoc_audio_enc"] = ev["params"]
            stats["assoc_audio_enc"] = ev["batch_stats"]
        return params, stats

    @staticmethod
    def param_labels(params):
        """Only associators train (trainer_proietta.py:96,134)."""
        return {
            k: ("train" if k.startswith("assoc") else "frozen") for k in params
        }

    # -------------------------------------------------------------- forward

    def _associate(self, params, batch_stats, spec, video, rngs, *, train):
        """Translated (mean, std) in acoustic latent space + new stats."""
        new_stats = dict(batch_stats)
        results = []
        if self.fusion or self.encoder_type == "Video":
            vi_out = self.video.apply(
                {"params": params["video"], "batch_stats": batch_stats["video"]},
                video, sample=False, train=False,
            )
            m, s = self.assoc_video.apply(
                {"params": params["assoc_video"]},
                vi_out.mean.astype(jnp.float32), vi_out.std.astype(jnp.float32),
            )
            results.append((m, s))
        if self.fusion:
            au_out = self.audio.apply(
                {"params": params["audio"], "batch_stats": batch_stats["audio"]},
                spec, sample=False, train=False,
            )
            m, s = self.assoc_audio.apply(
                {"params": params["assoc_audio"]},
                au_out.mean.astype(jnp.float32), au_out.std.astype(jnp.float32),
            )
            results.append((m, s))
        elif self.encoder_type != "Video":
            if train:
                (m, s), mut = self.assoc_audio_enc.apply(
                    {
                        "params": params["assoc_audio_enc"],
                        "batch_stats": batch_stats["assoc_audio_enc"],
                    },
                    spec, train=True, mutable=["batch_stats"],
                )
                new_stats["assoc_audio_enc"] = mut["batch_stats"]
            else:
                m, s = self.assoc_audio_enc.apply(
                    {
                        "params": params["assoc_audio_enc"],
                        "batch_stats": batch_stats["assoc_audio_enc"],
                    },
                    spec, train=False,
                )
            results.append((m, s))
        if len(results) == 2:  # fusion average (:53-54)
            mean = (results[0][0] + results[1][0]) / 2
            std = (results[0][1] + results[1][1]) / 2
        else:
            mean, std = results[0]
        return mean, std, results, new_stats

    def _forward(self, params, batch_stats, batch: Batch, rngs, *, train: bool):
        ac, spec, video = self._inputs(batch)
        mean, std, per_assoc, new_stats = self._associate(
            params, batch_stats, spec, video, rngs, train=train
        )
        out = self.acoustic.apply(
            {"params": params["acoustic"]},
            ac,
            external_latent=(mean, std),
            rngs={"latent": rngs["latent"]},
        )
        return ac, out, mean, std, per_assoc, new_stats

    # ----------------------------------------------------------------- loss

    def loss(self, params, batch_stats, batch: Batch, rngs, *, train: bool):
        cfg = self.cfg.model
        ac, out, mean, std, per_assoc, new_stats = self._forward(
            params, batch_stats, batch, rngs, train=train
        )
        recon = out.output.astype(jnp.float32)
        mse = mse_tf(ac, recon)
        hub = huber_tf(ac, recon)
        kl = sum(kl_diag_gaussian(m, s) for m, s in per_assoc)
        latent_term = jnp.mean(kl) / 1e6
        metrics = {"mse": mse, "huber": hub, "latent_loss": latent_term}

        if cfg.l2:
            align = mse_tf(out.mean, mean) + mse_tf(out.std, std)
            metrics["l2_latent"] = align
            metric_term = align
        else:
            eps = jax.random.normal(rngs["latent"], out.std.shape, jnp.float32)
            z_ac = out.mean.astype(jnp.float32) + out.std.astype(jnp.float32) * eps
            labels = batch.action[::12]
            scenario = batch.location[::12]
            metric_term = jnp.float32(0.0)
            for m, s in per_assoc:
                z_t = m + s * eps
                tl, _ = triplet_all(z_ac, z_t, labels, scenario, self.cfg.optim.margin)
                metric_term = metric_term + tl
            metrics["triplet"] = metric_term

        reg = jnp.float32(0.0)
        if "assoc_audio_enc" in params:
            reg = reg + l2_regularization(params["assoc_audio_enc"], 8e-5)
        total = mse + hub + latent_term + metric_term + reg
        metrics["loss"] = total
        return total, metrics, new_stats

    # --------------------------------------------------------------- export

    def embeddings(self, params, batch_stats, batch: Batch, rng, *, use_mean: bool = False):
        """Per-second latents for export (``extract_fusion.py:120-126``):
        ``acoustic`` = the acoustic VAE's own latent, plus one entry per
        associator path (``video`` / ``audio`` translated into the acoustic
        space). One shared noise draw across all of them, like the
        reference; ``use_mean`` exports raw means."""
        rngs = {"latent": rng}
        _, out, _, _, per_assoc, _ = self._forward(
            params, batch_stats, batch, rngs, train=False
        )
        eps = jax.random.normal(rng, (out.mean.shape[0], 150), jnp.float32)

        def z(mean, std):
            mean = mean.astype(jnp.float32)
            return mean if use_mean else mean + std.astype(jnp.float32) * eps

        result = {"acoustic": z(out.mean, out.std)}
        names = []
        if self.fusion or self.encoder_type == "Video":
            names.append("video")
        if self.fusion or self.encoder_type != "Video":
            names.append("audio")
        for name, (m, s) in zip(names, per_assoc):
            result[name] = z(m, s)
        return result

    # ----------------------------------------------------------------- eval

    def eval_losses(self, params, batch_stats, batch: Batch, rngs):
        ac, out, *_ = self._forward(params, batch_stats, batch, rngs, train=False)
        recon = out.output.astype(jnp.float32)
        per = jnp.mean(jnp.square(recon - ac), axis=(1, 2, 3))
        return {"mse": per}, recon
