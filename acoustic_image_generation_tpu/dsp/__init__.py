from acoustic_image_generation_tpu.dsp.energy import find_logen
from acoustic_image_generation_tpu.dsp.iir import filtfilt_jax, filtfilt_numpy
from acoustic_image_generation_tpu.dsp.mfcc import mfcc_from_frames, mfcc_from_power
from acoustic_image_generation_tpu.dsp.windows import tukey

__all__ = [
    "find_logen",
    "filtfilt_jax",
    "filtfilt_numpy",
    "mfcc_from_frames",
    "mfcc_from_power",
    "tukey",
]
