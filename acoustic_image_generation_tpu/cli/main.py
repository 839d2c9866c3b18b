"""Experiment driver CLI mirroring the reference flag surface.

Flag names and selection logic follow ``/root/reference/main.py:33-80``
(flags) and ``:175-240, 286-323`` (model/trainer dispatch), mapped onto the
typed ``ExperimentConfig``. Integer 0/1 flags stay integers so reference
bash recipes translate 1:1:

    python -m acoustic_image_generation_tpu.cli.main \
        --mode train --embedding 1 --mfcc 1 --num_skip_conn 1 \
        --train_file lists/training.txt --valid_file lists/validation.txt \
        --batch_size 32 --learning_rate 0.0001 --num_epochs 50 \
        --exp_name acres1 --checkpoint_dir /ckpt

Task dispatch (reference trainer classes in parentheses):
    embedding=1, mfcc=1               -> GenerationTask      (TrainerMask)
    embedding=1, project/jointmvae=0  -> EmbedTask           (TrainerLoss /
                                         TrainerNCAproxyanchor via proxy=1)
    embedding=0, model=UNet           -> ReconstructTask     (Trainer)
    embedding=0, model=DualCamNet,
        mfcc=1                        -> ClassificationTask  (Trainer_classification)
        mfcc=0                        -> GeneratedClassificationTask
                                         (Trainer_rec_class)
"""

from __future__ import annotations

import argparse
import os
import sys

from acoustic_image_generation_tpu.core.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    OptimConfig,
    ParallelConfig,
    RunConfig,
)


def _resnet_units(s: str) -> tuple[int, ...]:
    """argparse type for --resnet_units: exactly 4 positive ints."""
    try:
        units = tuple(int(u) for u in s.split(","))
    except ValueError:
        raise argparse.ArgumentTypeError(f"not a comma-separated int list: {s!r}")
    if len(units) != 4 or any(u < 1 for u in units):
        raise argparse.ArgumentTypeError(
            f"--resnet_units needs 4 positive ints (e.g. 3,4,6,3), got {s!r}"
        )
    return units


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="acoustic_image_generation_tpu",
        description="TPU-native acoustic-image generation framework",
    )
    # mode / model selection (main.py:33-40, 62-80)
    p.add_argument("--mode", default="train", choices=["train", "test"])
    p.add_argument("--model", default="UNet", choices=["UNet", "DualCamNet"])
    p.add_argument("--encoder_type", default="Video",
                   choices=["Video", "Audio", "Ac", "Energy"])
    p.add_argument("--embedding", type=int, default=0)
    p.add_argument("--mfcc", type=int, default=0)
    p.add_argument("--mfccmap", type=int, default=0)
    p.add_argument("--num_skip_conn", type=int, default=1, choices=[0, 1, 2])
    p.add_argument("--ae", type=int, default=0)
    # extension (no reference equivalent): ResNet units per block, e.g.
    # "1,1,1,1" for the structurally identical reduced-depth test variant
    p.add_argument("--resnet_units", type=_resnet_units, default=(3, 4, 6, 3))
    p.add_argument("--proxy", type=int, default=0)
    p.add_argument("--fusion", type=int, default=0)
    p.add_argument("--moddrop", type=int, default=0)
    p.add_argument("--l2", type=int, default=0)
    p.add_argument("--project", type=int, default=0)
    p.add_argument("--jointmvae", type=int, default=0)
    p.add_argument("--onlyaudiovideo", type=int, default=0)
    p.add_argument("--correspondence", type=int, default=0)
    p.add_argument("--temporal_pooling", type=int, default=0)
    p.add_argument("--num_class", type=int, default=128)
    # data (main.py:36-40, 52-58, 64)
    p.add_argument("--datatype", default="outdoor", choices=["outdoor", "old", "music"])
    p.add_argument("--train_file", default=None)
    p.add_argument("--valid_file", default=None)
    p.add_argument("--test_file", default=None)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--sample_length", type=int, default=1)
    p.add_argument("--total_length", type=int, default=30)
    p.add_argument("--number_of_crops", type=int, default=30)
    p.add_argument("--buffer_size", type=int, default=100)
    p.add_argument("--block_size", type=int, default=1)
    # optimization (main.py:46-51, 61, 78-80)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--latent_loss", type=float, default=1e-6)
    p.add_argument("--margin", type=float, default=0.2)
    p.add_argument("--MSE", type=int, default=1)
    p.add_argument("--huber_loss", type=int, default=1)
    # NON-REFERENCE opt-in (no upstream twin): logit-space sigmoid
    # cross-entropy recon term — the dead-sigmoid-collapse repair for
    # sparse targets (docs/RESULTS.md; typically with --MSE 0
    # --huber_loss 0)
    p.add_argument("--bce_loss", type=int, default=0)
    # bookkeeping (main.py:41-45, 58-60)
    p.add_argument("--exp_name", default="exp")
    p.add_argument("--checkpoint_dir", default="checkpoints")
    p.add_argument("--tensorboard", default=None)
    p.add_argument("--init_checkpoint", default=None)
    p.add_argument("--acoustic_init_checkpoint", default=None)
    p.add_argument("--audio_init_checkpoint", default=None)
    p.add_argument("--visual_init_checkpoint", default=None)
    p.add_argument("--restore_checkpoint", default=None)
    p.add_argument("--display_freq", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    # TPU-native extensions (no reference counterpart)
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--num_devices", type=int, default=None)
    # frozen-trunk performance ladder (docs/PERF.md): reference-faithful
    # train-BN -> frozen-BN -> +int8 quantized trunk -> +feature cache
    p.add_argument("--trunk_bn", default="train", choices=["train", "frozen"])
    p.add_argument("--cache_trunk_features", type=int, default=0)
    p.add_argument("--trunk_quant", default="none", choices=["none", "int8"])
    p.add_argument("--cache_disk_dir", default=None,
                   help="cross-run disk tier for cached trunk features")
    p.add_argument("--cache_features_dtype", default="bf16",
                   choices=["bf16", "f8_e4m3"],
                   help="storage dtype for cached trunk features "
                        "(f8_e4m3 halves every cache tier's footprint)")
    p.add_argument("--fused_conv", type=int, default=0,
                   help="fused Pallas conv-chain kernels for the "
                        "generator's stride-1 3x3 conv pairs (TPU only)")
    p.add_argument("--fused_qgemm", type=int, default=0,
                   help="with --trunk_quant int8: fused Pallas streaming "
                        "GEMM for the trunk's 1x1 convs (conv+dequant+"
                        "residual+ReLU+requant in one kernel)")
    # multi-host pods: each process decodes only its slice of the global
    # batch (data/pipeline.py shard_index/shard_count)
    p.add_argument("--host_shard", type=int, default=0)
    return p


def config_from_args(args) -> ExperimentConfig:
    return ExperimentConfig(
        data=DataConfig(
            datatype=args.datatype,
            train_file=args.train_file,
            valid_file=args.valid_file,
            test_file=args.test_file,
            batch_size=args.batch_size,
            sample_length=args.sample_length,
            total_length=args.total_length,
            number_of_crops=args.number_of_crops,
            buffer_size=args.buffer_size,
            block_size=args.block_size,
            correspondence=bool(args.correspondence),
            host_shard=bool(args.host_shard),
        ),
        model=ModelConfig(
            model=args.model,
            encoder_type=args.encoder_type,
            embedding=bool(args.embedding),
            mfcc=bool(args.mfcc),
            mfccmap=bool(args.mfccmap),
            num_skip_conn=args.num_skip_conn,
            ae=bool(args.ae),
            resnet_units=args.resnet_units,
            proxy=bool(args.proxy),
            fusion=bool(args.fusion),
            moddrop=bool(args.moddrop),
            l2=bool(args.l2),
            project=bool(args.project),
            jointmvae=bool(args.jointmvae),
            onlyaudiovideo=bool(args.onlyaudiovideo),
            correspondence=bool(args.correspondence),
            temporal_pooling=bool(args.temporal_pooling),
            num_class=args.num_class,
            trunk_bn=args.trunk_bn,
            cache_trunk_features=bool(args.cache_trunk_features),
            trunk_quant=args.trunk_quant,
            cache_disk_dir=args.cache_disk_dir,
            cache_features_dtype=args.cache_features_dtype,
            fused_conv=bool(args.fused_conv),
            fused_qgemm=bool(args.fused_qgemm),
        ),
        optim=OptimConfig(
            learning_rate=args.learning_rate,
            num_epochs=args.num_epochs,
            latent_loss=args.latent_loss,
            margin=args.margin,
            mse=bool(args.MSE),
            huber=bool(args.huber_loss),
            bce=bool(args.bce_loss),
        ),
        run=RunConfig(
            mode=args.mode,
            exp_name=args.exp_name,
            checkpoint_dir=args.checkpoint_dir,
            tensorboard=args.tensorboard,
            init_checkpoint=args.init_checkpoint,
            acoustic_init_checkpoint=args.acoustic_init_checkpoint,
            audio_init_checkpoint=args.audio_init_checkpoint,
            visual_init_checkpoint=args.visual_init_checkpoint,
            restore_checkpoint=args.restore_checkpoint,
            display_freq=args.display_freq,
            seed=args.seed,
        ),
        parallel=ParallelConfig(
            compute_dtype=args.compute_dtype, num_devices=args.num_devices
        ),
    )


def select_task(config: ExperimentConfig):
    """Reference trainer dispatch (main.py:214-240, 309-323)."""
    m = config.model
    if m.embedding:
        if m.project:
            from acoustic_image_generation_tpu.train.project import ProjectTask

            return ProjectTask(config)
        if m.jointmvae:
            from acoustic_image_generation_tpu.train.joint import JointTask

            return JointTask(config)
        if m.mfcc:
            from acoustic_image_generation_tpu.train.generation import GenerationTask

            return GenerationTask(config)
        from acoustic_image_generation_tpu.train.embed import EmbedTask

        return EmbedTask(config)
    if m.model == "UNet":
        from acoustic_image_generation_tpu.train.reconstruct import ReconstructTask

        return ReconstructTask(config)
    if config.data.correspondence:
        # extension: the reference's loaders emit correspondence labels
        # (outdoor_data_mfcc.py:888-928) but no main.py trainer consumes
        # them; DualCamNet(2) over the augmented batch does.
        from acoustic_image_generation_tpu.train.classify import CorrespondenceTask

        return CorrespondenceTask(config)
    if m.mfcc:
        from acoustic_image_generation_tpu.train.classify import ClassificationTask

        return ClassificationTask(config)
    from acoustic_image_generation_tpu.train.classify import GeneratedClassificationTask

    return GeneratedClassificationTask(config)


def make_loader(config: ExperimentConfig, split: str):
    from acoustic_image_generation_tpu.data.pipeline import AcousticImageDataLoader

    files = {
        "training": config.data.train_file,
        "validation": config.data.valid_file,
        "testing": config.data.test_file,
    }
    path = files[split]
    if path is None:
        return None
    shard = {}
    if config.data.host_shard:
        import jax

        shard = {
            "shard_index": jax.process_index(),
            "shard_count": jax.process_count(),
        }
        if jax.process_count() > 1 and split != "training":
            # multi-host eval runs on full batches only: a padded
            # remainder's real rows are a per-host prefix, which the
            # global contiguous-prefix valid mask cannot describe
            # (device_batch rejects such batches). Dropping the final
            # partial batch loses at most batch_size-1 windows of the
            # eval split — the standard pod-scale trade.
            shard["drop_remainder"] = True
    return AcousticImageDataLoader(
        path,
        split,
        config.data.batch_size,
        sample_length=config.data.sample_length,
        datakind=config.data.datatype,
        seed=config.run.seed,
        **shard,
    )


def main(argv=None) -> int:
    from acoustic_image_generation_tpu.core.platform import honor_env_platforms

    honor_env_platforms()
    args = build_parser().parse_args(argv)
    config = config_from_args(args)
    task = select_task(config)

    from acoustic_image_generation_tpu.train.trainer import Trainer

    trainer = Trainer(task, config)

    if config.run.mode == "train":
        train_loader = make_loader(config, "training")
        valid_loader = make_loader(config, "validation")
        assert train_loader is not None and valid_loader is not None
        state = None
        run = config.run
        needs_init = run.restore_checkpoint or run.init_checkpoint or any(
            (run.visual_init_checkpoint, run.acoustic_init_checkpoint,
             run.audio_init_checkpoint)
        )
        if needs_init:
            from acoustic_image_generation_tpu.train.warmstart import (
                apply_init_checkpoints,
            )

            for first in train_loader.batches(0):
                break
            state = trainer.init_state(first)
            if run.restore_checkpoint:  # full resume (params + Adam + step)
                state = trainer.restore(run.restore_checkpoint, state)
            state = apply_init_checkpoints(state, config)
        trainer.fit(train_loader, valid_loader, state=state)
    else:
        test_loader = make_loader(config, "testing")
        assert test_loader is not None
        assert config.run.init_checkpoint or config.run.restore_checkpoint, (
            "test mode needs --init_checkpoint or --restore_checkpoint"
        )
        ckpt_path = config.run.init_checkpoint or config.run.restore_checkpoint
        for first in test_loader.batches(0):
            break
        template = trainer.init_state(first)
        state = trainer.restore(ckpt_path, template)
        results = trainer.test(state, test_loader)
        print(results)
    return 0


if __name__ == "__main__":
    sys.exit(main())
