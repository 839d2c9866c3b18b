from acoustic_image_generation_tpu.data.pipeline import AcousticImageDataLoader, RawBatch
from acoustic_image_generation_tpu.data.preprocess import (
    Batch,
    correspondence_augment,
    correspondence_augment_no_video,
    preprocess_batch,
    tile_mfccmap,
)
from acoustic_image_generation_tpu.data.schema import DecodedRecord, decode_record
from acoustic_image_generation_tpu.data.windowing import plan_windows, read_list_file

__all__ = [
    "AcousticImageDataLoader",
    "RawBatch",
    "Batch",
    "correspondence_augment",
    "correspondence_augment_no_video",
    "preprocess_batch",
    "tile_mfccmap",
    "DecodedRecord",
    "decode_record",
    "plan_windows",
    "read_list_file",
]
