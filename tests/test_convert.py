"""Converter round-trip: raw capture dir -> shards -> loader batches."""

import os

import numpy as np
import pytest

from acoustic_image_generation_tpu.data.convert import (
    aspect_preserving_resize,
    central_crop,
    convert_capture_dir,
    make_second_example,
    prepare_video_frame,
    write_list_files,
)
from acoustic_image_generation_tpu.data.pipeline import AcousticImageDataLoader
from acoustic_image_generation_tpu.data.schema import decode_record
from acoustic_image_generation_tpu.data.tfrecord import read_records


def test_video_frame_prep_shapes():
    img = np.random.default_rng(0).integers(0, 255, (480, 640, 3), dtype=np.uint8)
    out = prepare_video_frame(img)
    assert out.shape == (224, 298, 3)
    assert aspect_preserving_resize(img, 224).shape[0] == 224
    assert central_crop(np.zeros((10, 10, 3)), 4, 6).shape == (4, 6, 3)


def test_make_second_example_roundtrip():
    rng = np.random.default_rng(2)
    audio = rng.integers(-1000, 1000, (12, 1024)).astype(np.int32)
    video = rng.integers(0, 255, (12, 224, 298, 3)).astype(np.uint8)
    acoustic = rng.random((12, 36, 48, 12)).astype(np.float32)
    boxes = {k: rng.integers(0, 200, (12, 3)).astype(np.int32)
             for k in ("xmin", "xmax", "ymin", "ymax")}
    payload = make_second_example(
        classes=3, location=7, audio=audio, video=video, acoustic=acoustic,
        boxes=boxes, classnumber=1, event=4,
    )
    rec = decode_record(payload, flip_acoustic=False)
    assert rec.action == 3 and rec.location == 7
    np.testing.assert_array_equal(rec.audio, audio)
    np.testing.assert_array_equal(rec.video, video)
    np.testing.assert_array_equal(rec.acoustic, acoustic)
    np.testing.assert_array_equal(rec.extras["xmin"], boxes["xmin"])
    assert rec.extras["classnumber"] == 1
    assert rec.extras["event"] == 4


@pytest.fixture
def raw_capture(tmp_path):
    """Fake raw capture: bmp frames + wav + video_time.txt."""
    from PIL import Image
    from scipy.io import wavfile

    rng = np.random.default_rng(3)
    raw = tmp_path / "class_2" / "data_005"
    (raw / "video").mkdir(parents=True)
    (raw / "audio").mkdir()
    seconds = 2
    for i in range(12 * seconds):
        img = rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
        Image.fromarray(img).save(raw / "video" / f"I_{i + 1:06d}.bmp")
    wav = rng.integers(-3000, 3000, (12288 * seconds,)).astype(np.int16)
    wavfile.write(raw / "audio" / "output_audio2.wav", 12288, wav)
    (raw / "video_time.txt").write_text(f"time: {seconds}\n")
    return str(raw), seconds


def test_convert_capture_dir_and_load(raw_capture, tmp_path):
    raw, seconds = raw_capture
    out = str(tmp_path / "converted")
    shards = convert_capture_dir(raw, out, classes=2, location=5)
    assert len(shards) == seconds
    # records decode with the standard loader schema
    payload = read_records(shards[0])[0]
    rec = decode_record(payload, include_acoustic=False)
    assert rec.video.shape == (12, 224, 298, 3)
    assert rec.audio.shape == (12, 1024)
    assert rec.action == 2 and rec.location == 5

    lists = write_list_files(out, shards)
    assert os.path.exists(lists["training"])
    loader = AcousticImageDataLoader(
        lists["training"], "testing", 1, modalities=(1, 2)
    )
    batches = list(loader.batches(0))
    assert batches and batches[0].video.shape[2:] == (224, 298, 3)


def test_write_video_time(tmp_path):
    from acoustic_image_generation_tpu.data.listing import write_video_time

    d = tmp_path / "cap"
    (d / "video").mkdir(parents=True)
    for i in range(30):  # 2.5 seconds -> 2 whole seconds
        (d / "video" / f"I_{i + 1:06d}.bmp").write_bytes(b"x")
    assert write_video_time(str(d)) == 2
    assert (d / "video_time.txt").read_text() == "time: 2\n"


def test_csv_to_clip_lists(tmp_path):
    from acoustic_image_generation_tpu.data.listing import csv_to_clip_lists

    csv_path = tmp_path / "ann.csv"
    csv_path.write_text(
        "id,start,label\nabc123,10,dog barking\ndef456,5,dog barking\nzzz,0,train\n"
    )
    out = csv_to_clip_lists(str(csv_path), str(tmp_path / "lists"))
    assert set(out) == {"dog_barking", "train"}
    lines = open(out["dog_barking"]).read().strip().splitlines()
    assert lines == ["abc123,10", "def456,5"]


def test_reshard_uncompressed_roundtrip(tmp_path):
    """Uncompressed re-shards decode identically through both decoders and
    give ~18x single-core ingest throughput (gzip inflate dominates)."""
    from acoustic_image_generation_tpu.data.convert import reshard
    from acoustic_image_generation_tpu.data.pipeline import AcousticImageDataLoader
    from acoustic_image_generation_tpu.data.synthetic import write_synthetic_dataset
    from acoustic_image_generation_tpu.data.tfrecord import detect_compression

    lists = write_synthetic_dataset(
        str(tmp_path / "gz"), num_classes=2, videos_per_class=1, seconds_per_video=1
    )
    new_list = reshard(lists["testing"], str(tmp_path / "flat"))
    with open(new_list) as f:
        new_paths = [line.strip() for line in f]
    assert all(detect_compression(p) is None for p in new_paths)

    a = next(iter(AcousticImageDataLoader(lists["testing"], "testing", 2).batches(0)))
    b = next(iter(AcousticImageDataLoader(new_list, "testing", 2).batches(0)))
    np.testing.assert_array_equal(a.acoustic, b.acoustic)
    np.testing.assert_array_equal(a.video, b.video)
    # and through the native fast path explicitly
    from acoustic_image_generation_tpu.data import native

    if native.available():
        c = next(iter(
            AcousticImageDataLoader(new_list, "testing", 2, use_native=True).batches(0)
        ))
        np.testing.assert_array_equal(a.audio, c.audio)


def test_mux_mic_wav_from_dc_captures(tmp_path):
    """video.py capability: raw 128-mic .dc captures -> one mic's
    peak-normalized wav track (Fortran-order int32 frames, 1-indexed)."""
    from scipy.io import wavfile

    from acoustic_image_generation_tpu.data.convert import mux_mic_wav, read_dc_frame

    rng = np.random.default_rng(0)
    audio_dir = tmp_path / "cap" / "audio"
    audio_dir.mkdir(parents=True)
    frames = rng.integers(-(2**20), 2**20, (3, 128, 1024)).astype(np.int32)
    for h, frame in enumerate(frames):
        # Fortran order on disk, as the dualcam writes them (video.py:41)
        frame.flatten(order="F").tofile(audio_dir / f"A_{h + 1:06d}.dc")

    # the .dc reader inverts the disk layout exactly
    np.testing.assert_array_equal(
        read_dc_frame(str(audio_dir / "A_000001.dc")), frames[0]
    )

    out = mux_mic_wav(str(tmp_path / "cap"), str(tmp_path / "out" / "track.wav"), 5)
    rate, data = wavfile.read(out)
    assert rate == 12000
    expected = np.concatenate([f[5] for f in frames]).astype(np.float32)
    expected = expected / abs(max(expected.min(), expected.max(), key=abs))
    np.testing.assert_allclose(data, expected, rtol=1e-6)
    assert abs(data).max() <= 1.0
