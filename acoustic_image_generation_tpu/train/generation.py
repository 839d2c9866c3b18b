"""Generation task: the AAAI'21 acoustic-image generator (TrainerMask).

Wires ResNet50 + UNetAcResNet{0,1,2}skip over (video, mfcc) -> acoustic
image exactly as ``/root/reference/trainer/mfcctrainer.py:28-82``:

    mfccmap = tile(mfcc)                      (:38-40)
    feat    = ResNet50(video)                 (:42)
    out     = UNetAcRes(mfccmap, feat)        (:45)
    loss    = [MSE] + [Huber] + latent_weight * mean(KL) + L2(resnet, 5e-4)
                                              (:46-62; reg via get_total_loss)

Eval reports the size-weighted MSE plus per-3-channel MSEs
(``:105-117``); validation best-epoch gating uses plain MSE (``:367-395``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acoustic_image_generation_tpu.core.config import ExperimentConfig
from acoustic_image_generation_tpu.data.preprocess import Batch
from acoustic_image_generation_tpu.losses import (
    huber_tf,
    kl_diag_gaussian,
    sigmoid_ce_logits,
    l2_regularization,
    mse_tf,
)
from acoustic_image_generation_tpu.models import ResNet50, UNetAcResNet
from acoustic_image_generation_tpu.models.unet_ac import tile_mfccmap


class GenerationTask:
    eval_metric = "mse"

    def __init__(self, config: ExperimentConfig):
        self.cfg = config
        dt = jnp.bfloat16 if config.parallel.compute_dtype == "bfloat16" else jnp.float32
        ch = config.data.num_channels
        u = config.model.resnet_units
        blocks = ((64, u[0], 1), (128, u[1], 2), (256, u[2], 2), (512, u[3], 1))
        # freeze_trunk: the reference optimizes var_list = UNet vars +
        # conv_map/logits only (mfcctrainer.py:64, vision.py:70) — the
        # ImageNet backbone is a frozen feature extractor whose BN stats
        # still update. Freezing also removes the trunk backward pass.
        # trunk_bn="frozen" additionally pins the trunk BNs to their
        # running averages (deterministic trunk — see ModelConfig.trunk_bn).
        self.trunk_bn_frozen = config.model.trunk_bn == "frozen"
        # trunk_quant="int8": run the frozen trunk as a BN-folded W8A8
        # int8 program (models/quant.py) — ~2x the uncached trunk roofline
        # on v5e (int8 MXU rate + halved HBM traffic). Requires the
        # deterministic (frozen-BN) trunk, since BN folding bakes the
        # running stats into the weights.
        self.trunk_quant = getattr(config.model, "trunk_quant", "none")
        if self.trunk_quant not in ("none", "int8"):
            raise ValueError(f"unknown trunk_quant {self.trunk_quant!r}")
        if self.trunk_quant != "none" and not self.trunk_bn_frozen:
            raise ValueError('trunk_quant="int8" requires trunk_bn="frozen"')
        self._blocks = blocks
        self.resnet = ResNet50(
            blocks=blocks, dtype=dt, freeze_trunk=True,
            trunk_bn_frozen=self.trunk_bn_frozen,
        )
        self.generator = UNetAcResNet(
            channels=ch,
            skips=config.model.num_skip_conn,
            embedding=config.model.ae,
            fused=getattr(config.model, "fused_conv", False),
            dtype=dt,
        )

    # ---------------------------------------------------------------- freeze

    @staticmethod
    def param_labels(params):
        """optax.multi_transform labels matching the reference's
        ``var_list`` (mfcctrainer.py:64): the generator and the ResNet's
        conv_map/logits heads train; the backbone gets no Adam slots."""
        return {
            "generator": "train",
            "resnet": {
                k: ("train" if k in ("conv_map", "logits") else "frozen")
                for k in params["resnet"]
            },
        }

    # ------------------------------------------------------------------ init

    def init_variables(self, rng, batch: Batch):
        kr, kg, kl = jax.random.split(rng, 3)
        video = batch.video[:1]
        rv = self.resnet.init({"params": kr}, video, train=False)
        mfccmap = tile_mfccmap(batch.mfcc[:1])
        gv = self.generator.init(
            {"params": kg, "latent": kl}, mfccmap, jnp.zeros((1, 12, 16, 12), video.dtype)
        )
        params = {"resnet": rv["params"], "generator": gv["params"]}
        batch_stats = {"resnet": rv["batch_stats"]}
        return params, batch_stats

    # ------------------------------------------------------------------ loss

    def trunk_features(self, params, batch_stats, video, qtrunk=None):
        """Frozen-trunk features at the stop_gradient boundary (block4
        output, pre-conv_map). Deterministic per frame when
        trunk_bn="frozen" — the cacheable quantity of
        train/feature_cache.py. Returned in the compute dtype (bfloat16
        on TPU) so the cache is half-size. With ``qtrunk`` (a calibrated
        models/quant.py pytree) the trunk runs as the int8 program."""
        if qtrunk is not None:
            from acoustic_image_generation_tpu.models import quant

            feat, _ = quant.trunk_forward(
                qtrunk,
                video,
                self._blocks,
                out_dtype=self.resnet.dtype,
                fused_gemm=getattr(self.cfg.model, "fused_qgemm", False),
            )
            return feat
        return self.resnet.apply(
            {"params": params["resnet"], "batch_stats": batch_stats["resnet"]},
            video,
            train=False,
            mode="trunk",
        )

    def trunk_state(self, params, batch_stats):
        """Everything (bf16-path) ``trunk_features`` depends on: the frozen
        backbone params + BN stats, EXCLUDING the trainable conv_map/logits
        heads (they sit above the block4 boundary). This is the identity
        the disk feature tier fingerprints (train/feature_cache.py) — two
        runs share cached features iff these trees hash equal, which holds
        across seeds exactly when the trunk is warm-started
        (``/root/reference/models/vision.py:20-42``)."""
        drop = ("conv_map", "logits")
        return (
            {k: v for k, v in params["resnet"].items() if k not in drop},
            {k: v for k, v in batch_stats["resnet"].items() if k not in drop},
        )

    def build_qtrunk(self, params, batch_stats, calib_video):
        """Prepack + calibrate the int8 trunk from the current (frozen)
        resnet params. ``calib_video``: normalized frames (N,224,298,3)
        used for the one-pass static activation calibration."""
        from acoustic_image_generation_tpu.models import quant

        qt = quant.quantize_trunk(params["resnet"], batch_stats["resnet"])
        return quant.calibrate(qt, calib_video, self._blocks)

    def _forward(
        self,
        params,
        batch_stats,
        batch: Batch,
        rngs,
        *,
        train: bool,
        trunk_feat=None,
        qtrunk=None,
    ):
        if trunk_feat is None and qtrunk is not None:
            # int8 trunk: produce the boundary features quantized, then
            # take the same head-only path as the feature cache, so
            # conv_map/logits BN stats and gradients are identical.
            trunk_feat = self.trunk_features(params, batch_stats, batch.video, qtrunk)
        video_or_feat = batch.video if trunk_feat is None else trunk_feat
        mode = "full" if trunk_feat is None else "head"
        if train:
            feat, mutated = self.resnet.apply(
                {"params": params["resnet"], "batch_stats": batch_stats["resnet"]},
                video_or_feat,
                train=True,
                mode=mode,
                mutable=["batch_stats"],
            )
            if trunk_feat is None:
                new_stats = {"resnet": mutated["batch_stats"]}
            else:
                # head-only apply declares only conv_map/logits stats; keep
                # the (frozen) trunk stats so the state tree stays intact
                new_stats = {
                    "resnet": {**batch_stats["resnet"], **mutated["batch_stats"]}
                }
        else:
            feat = self.resnet.apply(
                {"params": params["resnet"], "batch_stats": batch_stats["resnet"]},
                video_or_feat,
                train=False,
                mode=mode,
            )
            new_stats = batch_stats
        out = self.generator.apply(
            {"params": params["generator"]},
            tile_mfccmap(batch.mfcc),
            feat,
            rngs={"latent": rngs["latent"]},
        )
        return out, new_stats

    def loss(
        self,
        params,
        batch_stats,
        batch: Batch,
        rngs,
        *,
        train: bool,
        trunk_feat=None,
        qtrunk=None,
    ):
        out, new_stats = self._forward(
            params, batch_stats, batch, rngs, train=train, trunk_feat=trunk_feat,
            qtrunk=qtrunk,
        )
        cfg = self.cfg.optim
        recon = out.output.astype(jnp.float32)
        target = batch.acoustic

        mse = mse_tf(target, recon)
        metrics = {"mse": mse}
        total = jnp.float32(0.0)
        if cfg.mse:
            total = total + mse
        if cfg.huber:
            hub = huber_tf(target, recon)
            metrics["huber"] = hub
            total = total + hub
        if cfg.bce:
            ce = sigmoid_ce_logits(target, out.logits)
            metrics["bce"] = ce
            total = total + ce
        if not self.cfg.model.ae:
            kl = cfg.latent_loss * jnp.mean(kl_diag_gaussian(out.mean, out.std))
            metrics["latent_loss"] = kl
            total = total + kl
        reg = l2_regularization(params["resnet"], cfg.resnet_weight_decay)
        metrics["regularization"] = reg
        total = total + reg
        metrics["loss"] = total
        return total, metrics, new_stats

    # ------------------------------------------------------------------ eval

    def eval_losses(
        self, params, batch_stats, batch: Batch, rngs, qtrunk=None, trunk_feat=None
    ):
        """Per-frame loss vectors for size-weighted accumulation
        (mfcctrainer.py:411-442) + per-3-channel test MSEs (:105-117).
        ``trunk_feat`` bypasses the frozen trunk like the cached train
        step (the validation set's features are just as cacheable)."""
        out, _ = self._forward(
            params, batch_stats, batch, rngs, train=False, qtrunk=qtrunk,
            trunk_feat=trunk_feat,
        )
        recon = out.output.astype(jnp.float32)
        err = jnp.square(recon - batch.acoustic)
        per_frame = jnp.mean(err, axis=(1, 2, 3))
        losses = {"mse": per_frame}
        for i in range(4):
            losses[f"mse{i}"] = jnp.mean(err[..., 3 * i : 3 * i + 3], axis=(1, 2, 3))
        return losses, recon

    # ------------------------------------------------------------ inference

    def generate(self, params, batch_stats, mfcc, video, key, qtrunk=None):
        """Serving path: (mfcc (N,12), video (N,224,298,3) in [0,1]) ->
        generated acoustic images (N,36,48,C). Jit this once and feed
        batches; eval-mode BN, latent sampled like the reference does at
        test time (no eval switch on tf.random_normal)."""
        batch = Batch(
            acoustic=jnp.zeros((mfcc.shape[0], 36, 48, self.cfg.data.num_channels)),
            audio=jnp.zeros((mfcc.shape[0], 1024)),
            mfcc=mfcc,
            video=video,
            action=jnp.zeros((mfcc.shape[0],), jnp.int32),
            location=jnp.zeros((mfcc.shape[0],), jnp.int32),
            filtered_mfcc=jnp.zeros_like(mfcc),
        )
        out, _ = self._forward(
            params, batch_stats, batch, {"latent": key}, train=False, qtrunk=qtrunk
        )
        return out.output.astype(jnp.float32)
