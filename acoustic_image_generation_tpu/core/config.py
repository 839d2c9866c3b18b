"""Typed experiment configuration.

Replaces the reference's global ``tf.app.flags`` singleton
(``/root/reference/main.py:33-80``, re-declared per tool at e.g.
``/root/reference/iouenergythreshold.py:18-28``) with explicit dataclasses.
Every flag in the reference has a counterpart here; the CLI maps the same
flag names onto these fields so reference recipes translate 1:1.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class DataConfig:
    """Dataset selection and input-pipeline options.

    Mirrors the loader arguments of
    ``/root/reference/dataloader/outdoor_data_mfcc.py:17-19`` and the
    data flags of ``/root/reference/main.py:36-40,52-58,64``.
    """

    datatype: str = "outdoor"  # outdoor | old | music
    train_file: str | None = None
    valid_file: str | None = None
    test_file: str | None = None
    batch_size: int = 8
    sample_length: int = 1  # seconds per clip window
    total_length: int = 30
    number_of_crops: int = 30
    buffer_size: int = 100
    block_size: int = 1
    sample_rate: int = 12288
    shuffle_train: bool = True
    normalize_spectrogram: bool = False
    correspondence: bool = False
    correspondence_video: bool = False
    random_pick: bool = False
    build_spectrogram: bool = True
    # modalities: 0 = acoustic images, 1 = audio samples, 2 = video
    modalities: tuple[int, ...] = (0, 1, 2)
    num_io_threads: int = 8
    prefetch_batches: int = 2
    # use the fused Pallas MFCC kernel (ops/pallas_mfcc) instead of the
    # jnp reference frontend inside the jitted step (TPU only)
    pallas_mfcc: bool = False
    # stats2s directory holding global spectrogram mean/std .npy files
    # (outdoor_data_mfcc.py:119-159); None = sibling of train_file when
    # normalize_spectrogram is set
    stats_dir: str | None = None
    # multi-host input sharding: each process reads/decodes only its own
    # slice of every global batch (pipeline shard_index/shard_count from
    # jax.process_index()/process_count(); parallel.form_global_batch
    # assembles the global array). No-op in single-process runs.
    host_shard: bool = False

    @property
    def nr_frames(self) -> int:
        # reference: main.py:90  nr_frames = block_size * sample_length
        return self.block_size * self.sample_length

    @property
    def num_classes(self) -> int:
        return {"outdoor": 10, "old": 14, "music": 9}[self.datatype]

    @property
    def num_locations(self) -> int:
        return {"outdoor": 61, "old": 3, "music": 11}[self.datatype]

    @property
    def num_channels(self) -> int:
        return {"outdoor": 12, "old": 12, "music": 13}[self.datatype]


@dataclass(frozen=True)
class ModelConfig:
    """Model selection.

    Mirrors ``model``/``encoder_type``/``embedding``/``mfcc``/``mfccmap``/
    ``num_skip_conn``/``ae`` etc. of ``/root/reference/main.py:34-80``.
    """

    model: str = "UNet"  # UNet | DualCamNet
    encoder_type: str = "Video"  # Energy | Video | Ac | Audio
    embedding: bool = False
    mfcc: bool = False
    mfccmap: bool = False
    num_skip_conn: int = 1  # 0 | 1 | 2 skip connections in UNetAcRes
    ae: bool = False  # deterministic autoencoder instead of VAE
    proxy: bool = False  # NCA proxy loss
    fusion: bool = False
    moddrop: bool = False
    l2: bool = False  # plain L2 latent alignment
    project: bool = False  # latent-space associator projection
    jointmvae: bool = False
    onlyaudiovideo: bool = False
    correspondence: bool = False
    temporal_pooling: bool = False
    num_class: int = 128  # embedding size flag of the reference
    # ResNet50 units per block (reference: 3/4/6/3, resnet50.py:261-266).
    # Reduced values give a structurally identical trunk (same strides,
    # conv_map, shardings) for CPU-mesh dry runs and tests.
    resnet_units: tuple[int, int, int, int] = (3, 4, 6, 3)
    # BatchNorm policy for the frozen ResNet trunk in the generation task:
    # "train"  — reference-faithful: batch stats + moving-average updates
    #            while training (mfcctrainer.py:75-79 UPDATE_OPS);
    # "frozen" — running averages always (the trunk weights are frozen per
    #            vision.py:70, so its BN stats only re-estimate a fixed
    #            function; freezing them cuts the trunk forward ~44% and
    #            makes trunk features deterministic → cacheable).
    trunk_bn: str = "train"
    # Compute the frozen-trunk features once per window per dataset and
    # reuse them across epochs (requires trunk_bn="frozen"). The classic
    # frozen-backbone optimization: steady-state training then runs at
    # generator speed. See train/feature_cache.py and docs/PERF.md.
    cache_trunk_features: bool = False
    # Per-chip HBM budget for the device-resident tier of the trunk
    # feature cache (train/feature_cache.DeviceFeatureCache): windows that
    # fit stay in HBM and the train step gathers them on device (zero
    # feature bytes over PCIe in steady state); the rest use the host
    # tier. 0 disables the device tier. Only used with
    # cache_trunk_features=True.
    cache_device_bytes: int = 4 << 30
    # Host-RAM budget for each eval loader's feature cache (validation
    # rides the frozen-trunk cache across the per-epoch evals; see
    # Trainer.evaluate). 0 disables eval-side caching. Only used with
    # cache_trunk_features=True.
    cache_eval_bytes: int = 8 << 30
    # Cross-RUN disk tier for the trunk feature cache: a directory where
    # computed features persist, keyed by a digest of the frozen backbone
    # (or calibrated int8 trunk) + the loader's window table. The
    # reference protocol trains 5 seeds x many variants over the same
    # dataset with the same warm-started trunk (scripts/test.bash:5) —
    # with this set, every run after the first skips the trunk entirely.
    # None disables. Only used with cache_trunk_features=True.
    cache_disk_dir: str | None = None
    # Per-store byte cap for the disk tier above.
    cache_disk_bytes: int = 256 << 30
    # Storage dtype for cached trunk features, across ALL cache tiers
    # (HBM pool / host RAM / disk): "bf16" keeps the trunk's native
    # compute dtype (bfloat16 in the TPU recipe — exact: the cached step
    # provably matches the full step); "f8_e4m3" stores float8_e4m3 —
    # half the footprint and PCIe traffic everywhere and 2x the HBM-pool
    # capacity, at the cost of rounding the features once (~2-3% RMS)
    # which the trainable head absorbs — same argument as the int8
    # trunk. Only used with cache_trunk_features=True.
    cache_features_dtype: str = "bf16"
    # Run the frozen trunk as a BN-folded W8A8 int8 program
    # (models/quant.py): "none" | "int8". Requires trunk_bn="frozen"
    # (BN folding bakes the running stats into the weights). On v5e the
    # int8 MXU rate and halved HBM traffic roughly double the uncached
    # trunk-forward roofline; all trainable tensors stay full precision.
    trunk_quant: str = "none"
    # Run the generator's stride-1 3x3 conv+ReLU chains through the fused
    # Pallas kernels (ops/pallas_conv): one kernel per chain forward, one
    # per chain backward, intermediate activations VMEM-resident. Same
    # parameter tree and math (up to MXU summation order / one bf16
    # rounding per layer). TPU backends only; elsewhere the flag routes
    # through a numerically-identical XLA fallback.
    fused_conv: bool = False
    # With trunk_quant="int8": run every 1x1 stride-1 trunk conv through
    # the fused Pallas streaming GEMM (ops/pallas_qgemm.py) — conv +
    # dequant + bias + shortcut-add + ReLU + requant in one kernel, int8
    # in / int8 out. Outputs may differ from the XLA int8 path by <=1
    # int8 quantum (folded-requant rounding order). Measured verdict in
    # docs/PERF.md.
    fused_qgemm: bool = False


@dataclass(frozen=True)
class OptimConfig:
    """Optimization options (reference ``main.py:46-51,61,78-80``)."""

    learning_rate: float = 1e-4
    num_epochs: int = 100
    latent_loss: float = 1e-6  # KL weight of mfcctrainer.py:59
    margin: float = 0.2
    mse: bool = True
    huber: bool = True
    # NON-REFERENCE opt-in: add a sigmoid cross-entropy reconstruction
    # term computed in logit space (losses.sigmoid_ce_logits). The
    # reference's MSE(+Huber)-through-sigmoid gradient carries a
    # sigmoid'(logit) factor that underflows to exactly zero once Adam
    # saturates the output on sparse targets (the dead-sigmoid collapse,
    # docs/RESULTS.md); BCE's (y - t) logit-gradient self-corrects.
    # Typically used with mse=False, huber=False (the reported MSE
    # metric is unchanged either way).
    bce: bool = False
    # resnet_v1 arg scope weight decay (vision.py:54); contributes to the
    # total loss exactly like tf.losses.get_total_loss() did.
    resnet_weight_decay: float = 5e-4
    # TF1 AdamOptimizer numerics (bias correction in the step size, eps on
    # the uncorrected sqrt(v) — train/optim.py); False = optax.adam.
    # Default True: every reference trainer uses tf.train.AdamOptimizer
    # (mfcctrainer.py:64) and the placement of eps measurably changes
    # early-training weights (tests/test_parity_tf.py trajectory test).
    tf1_adam: bool = True


@dataclass(frozen=True)
class RunConfig:
    """Experiment bookkeeping (reference ``main.py:41-45,58-60``)."""

    mode: str = "train"  # train | test
    exp_name: str = "exp"
    checkpoint_dir: str = "checkpoints"
    tensorboard: str | None = None
    init_checkpoint: str | None = None
    acoustic_init_checkpoint: str | None = None
    audio_init_checkpoint: str | None = None
    visual_init_checkpoint: str | None = None
    restore_checkpoint: str | None = None
    display_freq: int = 1
    seed: int = 0
    # Write epoch-gate checkpoints on a background thread
    # (checkpoint.AsyncCheckpointer). Costs a transient on-device copy of
    # the state while the write is in flight (~2x state HBM during the
    # save) — disable for runs tuned to the edge of HBM.
    async_checkpoint: bool = True


@dataclass(frozen=True)
class ParallelConfig:
    """TPU mesh layout. New in this framework (reference is single-GPU,
    ``/root/reference/main.py:176,287``); the default is 1-axis data
    parallelism over all local devices (e.g. a v5e-8 slice over ICI)."""

    data_axis: str = "data"
    num_devices: int | None = None  # None = all local devices
    # compute dtype for conv/matmul inside models; params stay f32
    compute_dtype: str = "float32"  # or "bfloat16"
    # ZeRO-3-style sharding of params/gradients/Adam moments over the data
    # axis (parallel.fsdp_sharding); False = fully replicated state
    fsdp: bool = False
    # Tensor parallelism: split wide conv/dense output channels over a
    # second "model" mesh axis (parallel.tp_sharding); the mesh becomes
    # (data = num_devices // tensor_parallel, model = tensor_parallel) and
    # XLA inserts the per-layer collectives from the weight shardings.
    # 1 = off (pure data parallel). Mutually exclusive with fsdp.
    tensor_parallel: int = 1


@dataclass(frozen=True)
class ExperimentConfig:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    run: RunConfig = field(default_factory=RunConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    def save(self, path: str) -> None:
        """Write ``configuration.txt``-equivalent metadata
        (reference ``main.py:247-276``)."""
        with open(path, "w") as f:
            f.write(self.to_json())

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "ExperimentConfig":
        return ExperimentConfig(
            data=DataConfig(**d.get("data", {})),
            model=ModelConfig(**d.get("model", {})),
            optim=OptimConfig(**d.get("optim", {})),
            run=RunConfig(**d.get("run", {})),
            parallel=ParallelConfig(**d.get("parallel", {})),
        )

    @staticmethod
    def load(path: str) -> "ExperimentConfig":
        with open(path) as f:
            return ExperimentConfig.from_dict(json.load(f))
