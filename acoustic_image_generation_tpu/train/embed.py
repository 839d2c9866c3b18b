"""Cross-modal embedding task: three per-modality VAEs aligned in latent
space.

Capability port of ``TrainerLoss`` (``/root/reference/trainer/
trainer_three.py:32-134``) and ``TrainerNCAproxyanchor``
(``trainer2.py``), with variants selected from the config exactly like the
reference flags:

- default: batch-hard triplet (ac, video) + (ac, audio)   (:101-108)
- ``fusion``: average audio/video latents, all-triplets   (:75-80)
- ``moddrop``: Bernoulli modality dropout on the fused latent (:81-92,
  470-474; p_mod .98 video / .98 audio / .5 acoustic)
- ``l2``: plain MSE alignment of means and variances      (:93-100)
- ``proxy``: NCA loss instead of triplet                  (trainer2.py:577)

Total loss = 3x(MSE + Huber) + weight-decay regs + KL/1e6 [+ metric loss]
(:50-66, :110-116). One noise tensor is drawn per step and shared by every
modality's reparameterization, matching ``samples`` reuse at :73-103.

Unit of embedding = one second: the acoustic/video VAEs see the FIRST frame
of each second, the audio VAE the second's 193x257 magnitude spectrogram
(the reference's 99x257 STFT bilinearly resized, ``trainer/trainer.py:
367-369``). The three latents share one dimension (config
``model.num_class``; the reference's mixed 150/256/1024 dims only combine
because of broadcasting accidents — here they are made consistent, with
per-model dims still available on each module).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acoustic_image_generation_tpu.core.config import ExperimentConfig
from acoustic_image_generation_tpu.data.preprocess import Batch
from acoustic_image_generation_tpu.dsp.spectrogram import stft_magnitude
from acoustic_image_generation_tpu.losses import (
    huber_tf,
    sigmoid_ce_logits,
    kl_diag_gaussian,
    l2_regularization,
    mse_tf,
    nca_loss,
    triplet_all,
    triplet_hard,
)
from acoustic_image_generation_tpu.models import UNetAcoustic, UNetSound, UNetVideo

SAMPLES_PER_SECOND = 12 * 1024


def _load_spec_stats(config: ExperimentConfig):
    """Global spectrogram z-norm stats when ``normalize_spectrogram`` is
    set (outdoor_data_mfcc.py:119-159: a stats2s dir sibling to the list
    file)."""
    if not config.data.normalize_spectrogram:
        return None
    import os

    from acoustic_image_generation_tpu.data.stats import load_stats

    stats_dir = config.data.stats_dir
    if stats_dir is None and config.data.train_file:
        stats_dir = os.path.join(os.path.dirname(config.data.train_file), "stats2s")
    assert stats_dir is not None, "normalize_spectrogram needs stats_dir"
    return load_stats(stats_dir)


class EmbedTask:
    eval_metric = "mse"
    eval_mode = "min"

    def __init__(self, config: ExperimentConfig):
        self.cfg = config
        dt = jnp.bfloat16 if config.parallel.compute_dtype == "bfloat16" else jnp.float32
        latent = config.model.num_class
        self.spec_stats = _load_spec_stats(config)
        self.frames_per_clip = 12 * config.data.sample_length
        self.acoustic = UNetAcoustic(
            channels=config.data.num_channels, latent_dim=latent, dtype=dt
        )
        self.audio = UNetSound(variant="large", latent_dim=latent, dtype=dt)
        self.video = UNetVideo(latent_dim=latent, dtype=dt)

    # --------------------------------------------------------------- inputs

    def _inputs(self, batch: Batch):
        """Per-second (acoustic frame, spectrogram, video frame)."""
        f = 12  # frames per second
        ac = batch.acoustic[::f]
        video = batch.video[::f]
        wav = batch.audio.reshape(-1, SAMPLES_PER_SECOND)
        spec = stft_magnitude(wav)  # (N, 99, 257)
        if self.spec_stats is not None:  # z-norm with global stats
            from acoustic_image_generation_tpu.data.stats import normalize_spectrogram

            spec = normalize_spectrogram(spec, *self.spec_stats)
        spec = jax.image.resize(spec, (spec.shape[0], 193, 257), method="bilinear")
        return ac, spec[..., None], video

    # ----------------------------------------------------------------- init

    def init_variables(self, rng, batch: Batch):
        ka, ks, kv, kl = jax.random.split(rng, 4)
        ac, spec, video = self._inputs(batch)
        rngs = lambda k: {"params": k, "latent": kl}
        av = self.acoustic.init(rngs(ka), ac[:1])
        sv = self.audio.init(rngs(ks), spec[:1], train=False)
        vv = self.video.init(rngs(kv), video[:1], train=False)
        params = {"acoustic": av["params"], "audio": sv["params"], "video": vv["params"]}
        stats = {"audio": sv["batch_stats"], "video": vv["batch_stats"]}
        return params, stats

    # -------------------------------------------------------------- forward

    def _forward(self, params, batch_stats, batch, rngs, *, train):
        ac, spec, video = self._inputs(batch)
        ac_out = self.acoustic.apply(
            {"params": params["acoustic"]}, ac, sample=False
        )
        if train:
            au_out, au_mut = self.audio.apply(
                {"params": params["audio"], "batch_stats": batch_stats["audio"]},
                spec, sample=False, train=True, mutable=["batch_stats"],
            )
            vi_out, vi_mut = self.video.apply(
                {"params": params["video"], "batch_stats": batch_stats["video"]},
                video, sample=False, train=True, mutable=["batch_stats"],
            )
            new_stats = {
                "audio": au_mut["batch_stats"],
                "video": vi_mut["batch_stats"],
            }
        else:
            au_out = self.audio.apply(
                {"params": params["audio"], "batch_stats": batch_stats["audio"]},
                spec, sample=False, train=False,
            )
            vi_out = self.video.apply(
                {"params": params["video"], "batch_stats": batch_stats["video"]},
                video, sample=False, train=False,
            )
            new_stats = batch_stats
        return (ac, spec, video), (ac_out, au_out, vi_out), new_stats

    # ----------------------------------------------------------------- loss

    def loss(self, params, batch_stats, batch: Batch, rngs, *, train: bool):
        cfg = self.cfg.model
        inputs, outs, new_stats = self._forward(params, batch_stats, batch, rngs, train=train)
        (ac, spec, video) = inputs
        (ac_out, au_out, vi_out) = outs

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
        latent_term = jnp.mean(kl) / 1e6

        # one shared noise tensor, like the reference's single `samples`
        eps = jax.random.normal(rngs["latent"], ac_out.std.shape, jnp.float32)
        z_ac = ac_out.mean.astype(jnp.float32) + ac_out.std.astype(jnp.float32) * eps

        labels = batch.action[::12]  # one per second, matching the latents
        scenario = batch.location[::12]
        margin = self.cfg.optim.margin

        metrics = {"mse": mse, "huber": hub, "latent_loss": latent_term}
        metric_term = jnp.float32(0.0)
        if cfg.l2:
            l2m = mse_tf(vi_out.mean, ac_out.mean) + mse_tf(au_out.mean, ac_out.mean)
            l2s = mse_tf(vi_out.std, ac_out.std) + mse_tf(au_out.std, ac_out.std)
            metrics["l2_latent"] = l2m + l2s
            metric_term = l2m + l2s
        elif cfg.fusion:
            mean = (vi_out.mean + au_out.mean) / 2
            std = (vi_out.std + au_out.std) / 2
            z = mean.astype(jnp.float32) + std.astype(jnp.float32) * eps
            tl, frac = triplet_all(z_ac, z, labels, scenario, margin)
            metrics["triplet"] = tl
            metrics["fraction_positive"] = frac
            metric_term = tl
        elif cfg.moddrop:
            if train:
                km = rngs["moddrop"]
                on = lambda k, p: (jax.random.uniform(k, (1,)) < p).astype(jnp.float32)
                k1, k2, k3 = jax.random.split(km, 3)
                on_v, on_a, on_ac = on(k1, 0.98), on(k2, 0.98), on(k3, 0.5)
            else:
                on_v = on_a = on_ac = jnp.ones((1,))
            n_on = jnp.maximum(jnp.squeeze(on_v + on_a + on_ac), 1e-15)
            mean = (on_ac * ac_out.mean + on_a * au_out.mean + on_v * vi_out.mean) / n_on
            std = (on_ac * ac_out.std + on_a * au_out.std + on_v * vi_out.std) / n_on
            z = mean.astype(jnp.float32) + std.astype(jnp.float32) * eps
            tl, frac = triplet_all(z_ac, z, labels, scenario, margin)
            metrics["triplet"] = tl
            metric_term = tl
        elif cfg.proxy:
            z_a = au_out.mean.astype(jnp.float32) + au_out.std.astype(jnp.float32) * eps
            z_v = vi_out.mean.astype(jnp.float32) + vi_out.std.astype(jnp.float32) * eps
            nca = nca_loss(z_ac, z_v, labels, scenario) + nca_loss(
                z_ac, z_a, labels, scenario
            )
            metrics["nca"] = nca
            metric_term = nca
        else:
            z_a = au_out.mean.astype(jnp.float32) + au_out.std.astype(jnp.float32) * eps
            z_v = vi_out.mean.astype(jnp.float32) + vi_out.std.astype(jnp.float32) * eps
            tl_v, _ = triplet_hard(z_ac, z_v, labels, scenario, margin)
            tl_a, _ = triplet_hard(z_ac, z_a, labels, scenario, margin)
            metrics["triplet"] = tl_v + tl_a
            metric_term = tl_v + tl_a

        reg = (
            l2_regularization(params["audio"], 8e-5)
            + l2_regularization(params["video"], 7e-5)
        )
        if self.cfg.optim.bce:
            # NON-REFERENCE opt-in (OptimConfig.bce): logit-space sigmoid
            # cross-entropy replaces MSE+Huber as the reconstruction term
            # of all three VAEs. On sparse targets (the synthetic video's
            # near-black frames especially) the MSE-through-sigmoid
            # gradient dies by saturation exactly as in the generation
            # recipe (docs/RESULTS.md dead-sigmoid collapse); mse/huber
            # stay in metrics for comparability.
            ce = (
                sigmoid_ce_logits(ac, ac_out.logits)
                + sigmoid_ce_logits(spec, au_out.logits)
                + sigmoid_ce_logits(video, vi_out.logits)
            )
            metrics["bce"] = ce
            total = ce + latent_term + metric_term + reg
        else:
            total = mse + hub + latent_term + metric_term + reg
        metrics["regularization"] = reg
        metrics["loss"] = total
        return total, metrics, new_stats

    # ----------------------------------------------------------------- eval

    def eval_losses(self, params, batch_stats, batch: Batch, rngs):
        inputs, outs, _ = self._forward(params, batch_stats, batch, rngs, train=False)
        (ac, spec, video) = inputs
        (ac_out, au_out, vi_out) = outs
        per = lambda x, y: jnp.mean(
            jnp.square(x.astype(jnp.float32) - y.astype(jnp.float32)),
            axis=tuple(range(1, x.ndim)),
        )
        mse_ac = per(ac, ac_out.output)
        mse_au = per(spec, au_out.output)
        mse_vi = per(video, vi_out.output)
        return {
            "mse": mse_ac + mse_au + mse_vi,
            "mse_acoustic": mse_ac,
            "mse_audio": mse_au,
            "mse_video": mse_vi,
        }, (ac_out, au_out, vi_out)

    def embeddings(self, params, batch_stats, batch: Batch, rng, *, use_mean: bool = False):
        """Per-second latents for export / kNN / retrieval
        (``extract_triplet.py``): z = mean + std * eps per modality, or the
        raw means with ``use_mean`` (``mean.py``'s meanAc/meanAudio/
        meanVideo exports)."""
        _, (ac_out, au_out, vi_out), _ = self._forward(
            params, batch_stats, batch, {"latent": rng}, train=False
        )
        if use_mean:
            z = lambda o: o.mean.astype(jnp.float32)
        else:
            eps = jax.random.normal(rng, ac_out.std.shape, jnp.float32)
            z = lambda o: o.mean.astype(jnp.float32) + o.std.astype(jnp.float32) * eps
        return {"acoustic": z(ac_out), "audio": z(au_out), "video": z(vi_out)}
