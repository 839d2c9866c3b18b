"""Joint-MVAE task: fuse bottleneck feature maps across modalities and
reconstruct every modality from the shared code.

Port of ``TrainerMulti`` (``/root/reference/trainer/trainermulti.py:
32-125``) over two-stage encoders (``features`` / ``from_features`` on the
VAE modules, mirroring ``unet_noconc2 / unet_sound22 /
unet_architecture_noconc2``):

- default: ``Jointmvae`` fuses (ac, video, audio) 12x16 feature maps and
  emits three replacement maps; each modality's stage-2 (VAE head +
  decoder) reconstructs from its replacement. Loss = 3x(MSE+Huber) +
  sum KL / 1e6; ONLY the associator trains (:96).
- ``fusion``: ``JointTwomvae2`` fuses (video, audio) only, still emits all
  three maps (:51-53).
- ``onlyaudiovideo``: a frozen 3-input ``Jointmvae`` provides the target
  ac-feature; a trainable ``JointTwomvae`` predicts it from (video, audio)
  — feature-MSE + acoustic recon losses; only the 2-input associator
  trains (:99-125).
- ``moddrop``: Bernoulli(0.2) keep-gate on the ac feature map before
  fusing (:46-47).
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
    mse_tf,
)
from acoustic_image_generation_tpu.models import UNetAcoustic, UNetSound, UNetVideo
from acoustic_image_generation_tpu.models.associators import JointMVAE

SAMPLES_PER_SECOND = 12 * 1024


class JointTask:
    eval_metric = "mse"
    eval_mode = "min"

    def __init__(self, config: ExperimentConfig):
        self.cfg = config
        dt = jnp.bfloat16 if config.parallel.compute_dtype == "bfloat16" else jnp.float32
        self.acoustic = UNetAcoustic(channels=config.data.num_channels, dtype=dt)
        self.audio = UNetSound(variant="large", latent_dim=256, dtype=dt)
        self.video = UNetVideo(latent_dim=1024, dtype=dt)
        self.fusion = config.model.fusion
        self.onlyaudiovideo = config.model.onlyaudiovideo
        self.moddrop = config.model.moddrop
        if self.fusion:
            self.associator = JointMVAE(heads=("ac", "video", "audio"))  # JointTwomvae2
        else:
            self.associator = JointMVAE(heads=("ac", "video", "audio"))  # Jointmvae
        if self.onlyaudiovideo:
            self.associator1 = JointMVAE(heads=("ac",))  # JointTwomvae

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
        sv = self.audio.init({"params": ks[1], "latent": ks[5]}, spec[:1], train=False)
        vv = self.video.init({"params": ks[2], "latent": ks[5]}, video[:1], train=False)
        params = {"acoustic": av["params"], "audio": sv["params"], "video": vv["params"]}
        stats = {"audio": sv["batch_stats"], "video": vv["batch_stats"]}
        fmap = lambda c: jnp.zeros((1, 12, 16, c))
        if self.fusion:
            params["associator"] = self.associator.init(
                {"params": ks[3]}, fmap(512), fmap(128)
            )["params"]
        else:
            params["associator"] = self.associator.init(
                {"params": ks[3]}, fmap(133), fmap(512), fmap(128)
            )["params"]
        if self.onlyaudiovideo:
            params["associator1"] = self.associator1.init(
                {"params": ks[4]}, fmap(512), fmap(128)
            )["params"]
        return params, stats

    def param_labels(self, params):
        """Only the (second, for onlyaudiovideo) associator trains
        (trainermulti.py:96,125)."""
        trainable = "associator1" if self.onlyaudiovideo else "associator"
        return {k: ("train" if k == trainable else "frozen") for k in params}

    # -------------------------------------------------------------- forward

    def _features(self, params, batch_stats, inputs, rngs, *, train):
        ac, spec, video = inputs
        f_ac = self.acoustic.apply(
            {"params": params["acoustic"]}, ac, method="features"
        )
        if self.moddrop and train:
            on = (jax.random.uniform(rngs["moddrop"], (1,)) < 0.2).astype(f_ac.dtype)
            f_ac = f_ac * on
        f_vi = self.video.apply(
            {"params": params["video"], "batch_stats": batch_stats["video"]},
            video, train=False, method="features",
        )
        f_au = self.audio.apply(
            {"params": params["audio"], "batch_stats": batch_stats["audio"]},
            spec, train=False, method="features",
        )
        return f_ac, f_vi, f_au

    def _stage2(self, params, batch_stats, modality: str, fmap, rngs):
        module = getattr(self, modality)
        variables = {"params": params[modality]}
        kwargs = dict(sample=True, rngs={"latent": rngs["latent"]})
        if modality in batch_stats:
            variables["batch_stats"] = batch_stats[modality]
            return module.apply(variables, fmap, train=False, method="from_features", **kwargs)
        return module.apply(variables, fmap, method="from_features", **kwargs)

    # ----------------------------------------------------------------- loss

    def loss(self, params, batch_stats, batch: Batch, rngs, *, train: bool):
        inputs = self._inputs(batch)
        ac, spec, video = inputs
        f_ac, f_vi, f_au = self._features(params, batch_stats, inputs, rngs, train=train)
        if self.fusion:
            fused = self.associator.apply({"params": params["associator"]}, f_vi, f_au)
        else:
            fused = self.associator.apply(
                {"params": params["associator"]}, f_ac, f_vi, f_au
            )

        if self.onlyaudiovideo:
            pred = self.associator1.apply({"params": params["associator1"]}, f_vi, f_au)
            ac_out = self._stage2(params, batch_stats, "acoustic", pred["ac"], rngs)
            recon = ac_out.output.astype(jnp.float32)
            feat_l2 = mse_tf(fused["ac"], pred["ac"])
            mse = mse_tf(ac, recon)
            hub = huber_tf(ac, recon)
            latent = jnp.mean(kl_diag_gaussian(ac_out.mean, ac_out.std)) / 1e6
            total = feat_l2 + mse + hub + latent
            metrics = {
                "loss": total, "mse": mse, "huber": hub,
                "latent_loss": latent, "feature_l2": feat_l2,
            }
            return total, metrics, batch_stats

        ac_out = self._stage2(params, batch_stats, "acoustic", fused["ac"], rngs)
        vi_out = self._stage2(params, batch_stats, "video", fused["video"], rngs)
        au_out = self._stage2(params, batch_stats, "audio", fused["audio"], rngs)
        mse = (
            mse_tf(ac, ac_out.output)
            + mse_tf(spec, au_out.output)
            + mse_tf(video, vi_out.output)
        )
        hub = (
            huber_tf(ac, ac_out.output)
            + huber_tf(spec, au_out.output)
            + huber_tf(video, vi_out.output)
        )
        kl = (
            kl_diag_gaussian(ac_out.mean, ac_out.std)
            + kl_diag_gaussian(au_out.mean, au_out.std)
            + kl_diag_gaussian(vi_out.mean, vi_out.std)
        )
        latent = jnp.mean(kl) / 1e6
        total = mse + hub + latent
        metrics = {"loss": total, "mse": mse, "huber": hub, "latent_loss": latent}
        return total, metrics, batch_stats

    # --------------------------------------------------------------- export

    def embeddings(self, params, batch_stats, batch: Batch, rng, *, use_mean: bool = False):
        """Per-second latents for export (``extract_j.py:131-142``):
        ``acoustic`` = VAE head over the associator's ac feature map,
        ``acoustic_true`` = over the real acoustic features (the reference's
        AcTrue dirs), plus ``audio``/``video`` over their own features.
        ac/ac_true share one noise draw like the reference; ``use_mean``
        exports raw means (mean.py)."""
        rngs = {"latent": rng, "moddrop": rng}
        inputs = self._inputs(batch)
        f_ac, f_vi, f_au = self._features(params, batch_stats, inputs, rngs, train=False)
        if self.fusion:
            fused = self.associator.apply({"params": params["associator"]}, f_vi, f_au)
        else:
            fused = self.associator.apply(
                {"params": params["associator"]}, f_ac, f_vi, f_au
            )
        ac_feat = (
            self.associator1.apply({"params": params["associator1"]}, f_vi, f_au)["ac"]
            if self.onlyaudiovideo
            else fused["ac"]
        )
        head = lambda mod, f: self.__getattribute__(mod).apply(
            {"params": params[mod]}, f, False,
            method=lambda mdl, fm, smp: mdl.vae(fm, sample=smp),
        )
        z_ac = head("acoustic", ac_feat)
        z_true = head("acoustic", f_ac)
        # audio/video heads run over the associator's TRANSLATED features,
        # not the raw encoder features — extract_j.py:126-127 builds
        # modelaudio/_images over model_associator.outputaudio/outputvideo
        z_au = head("audio", fused["audio"])
        z_vi = head("video", fused["video"])

        def z(out, eps_key, dim):
            mean, std = out[1].astype(jnp.float32), out[2].astype(jnp.float32)
            if use_mean:
                return mean
            return mean + std * jax.random.normal(eps_key, (mean.shape[0], dim))

        k_ac = jax.random.fold_in(rng, 0)  # shared between ac and ac_true
        result = {
            "acoustic": z(z_ac, k_ac, 150),
            "acoustic_true": z(z_true, k_ac, 150),
        }
        if not self.onlyaudiovideo:
            result["audio"] = z(z_au, jax.random.fold_in(rng, 1), 256)
            result["video"] = z(z_vi, jax.random.fold_in(rng, 2), 1024)
        return result

    # ----------------------------------------------------------------- eval

    def eval_losses(self, params, batch_stats, batch: Batch, rngs):
        inputs = self._inputs(batch)
        ac, spec, video = inputs
        f_ac, f_vi, f_au = self._features(params, batch_stats, inputs, rngs, train=False)
        if self.fusion:
            fused = self.associator.apply({"params": params["associator"]}, f_vi, f_au)
        else:
            fused = self.associator.apply(
                {"params": params["associator"]}, f_ac, f_vi, f_au
            )
        if self.onlyaudiovideo:
            pred = self.associator1.apply({"params": params["associator1"]}, f_vi, f_au)
            ac_out = self._stage2(params, batch_stats, "acoustic", pred["ac"], rngs)
            per = jnp.mean(
                jnp.square(ac_out.output.astype(jnp.float32) - ac), axis=(1, 2, 3)
            )
            return {"mse": per}, ac_out.output
        ac_out = self._stage2(params, batch_stats, "acoustic", fused["ac"], rngs)
        per = jnp.mean(jnp.square(ac_out.output.astype(jnp.float32) - ac), axis=(1, 2, 3))
        return {"mse": per}, ac_out.output
