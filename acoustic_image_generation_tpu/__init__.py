"""TPU-native framework for acoustic image generation and audio-visual learning.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
IIT-PAVIS/Acoustic-Image-Generation (AAAI 2021): variational UNets that
reconstruct 36x48x12 acoustic images from video frames + single-mic MFCCs,
sound-source localization via inverse-MFCC energy maps, acoustic-image
classification (DualCamNet), and cross-modal embedding learning.

Typical usage::

    import acoustic_image_generation_tpu as aig

Subpackages
-----------
core      typed configs, RNG policy, checkpointing
dsp       MFCC frontend + inverse energy map (jnp + Pallas)
data      TFRecord/SequenceExample ingest without TF, host pipeline
models    flax model zoo (UNet family, ResNet50, DualCamNet, associators)
losses    reconstruction / metric / classification losses
parallel  mesh + sharding helpers (pjit data-parallel over ICI)
train     generic trainer + task recipes
evaluation IoU/AUC localization metrics, kNN, retrieval, export
ops       Pallas TPU kernels for hot ops
cli       command-line drivers mirroring the reference flag surface
"""

__version__ = "0.1.0"

SPATIAL_H = 36
SPATIAL_W = 48
NUM_MFCC = 12
FRAMES_PER_SECOND = 12
NUM_SAMPLES_PER_FRAME = 1024
SAMPLE_RATE = 12288
VIDEO_H = 224
VIDEO_W = 298
