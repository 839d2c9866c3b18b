"""C++ ingest library vs the pure-Python reference decoder: byte-identical
output on synthetic shards (SURVEY.md §2.6 native component)."""

import numpy as np
import pytest

from acoustic_image_generation_tpu.data import native
from acoustic_image_generation_tpu.data.pipeline import AcousticImageDataLoader
from acoustic_image_generation_tpu.data.synthetic import write_synthetic_dataset

pytestmark = pytest.mark.skipif(not native.available(), reason="no g++/zlib")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("native_ds")
    return write_synthetic_dataset(str(out), num_classes=2, videos_per_class=1,
                                   seconds_per_video=2)


def test_native_matches_python_decoder(dataset):
    lp = dataset["training"]
    loader_native = AcousticImageDataLoader(lp, "testing", 2, use_native=True)
    loader_python = AcousticImageDataLoader(lp, "testing", 2, use_native=False)
    got = list(loader_native.batches(0))
    expected = list(loader_python.batches(0))
    assert len(got) == len(expected) > 0
    for g, e in zip(got, expected):
        np.testing.assert_array_equal(g.acoustic, e.acoustic)
        np.testing.assert_array_equal(g.audio, e.audio)
        np.testing.assert_array_equal(g.video, e.video)
        np.testing.assert_array_equal(g.action, e.action)
        np.testing.assert_array_equal(g.location, e.location)
        assert g.valid == e.valid


def test_native_decode_single_file(dataset):
    with open(dataset["training"]) as f:
        path = f.readline().strip()
    acoustic = np.zeros((12, 36, 48, 12), np.float32)
    audio = np.zeros((12, 1024), np.int32)
    video = np.zeros((12, 224, 298, 3), np.uint8)
    action, location, frames = native.decode_file_into(path, acoustic, audio, video)
    assert frames == 12
    assert action in (0, 1)
    assert location >= 1
    assert np.any(acoustic != 0) and np.any(audio != 0)


def test_native_crc_verification(dataset, tmp_path):
    """Masked CRC32-C framing checks: a clean uncompressed re-shard passes,
    a single flipped payload byte is caught (gzip shards carry their own
    stream CRC; uncompressed ones rely on this check)."""
    from acoustic_image_generation_tpu.data import tfrecord

    with open(dataset["training"]) as f:
        src = f.readline().strip()
    records = list(tfrecord.read_records(src))
    clean = tmp_path / "clean.tfrecord"
    tfrecord.write_records(str(clean), records, compression=None)

    audio = np.zeros((12, 1024), np.int32)
    _, _, frames = native.decode_file_into(str(clean), None, audio, None,
                                           verify_crc=True)
    assert frames == 12

    blob = bytearray(clean.read_bytes())
    blob[len(blob) // 2] ^= 0xFF  # somewhere inside a record payload
    bad = tmp_path / "bad_crc.tfrecord"
    bad.write_bytes(bytes(blob))
    with pytest.raises(IOError, match="crc"):
        native.decode_file_into(str(bad), None, audio, None, verify_crc=True)
    # python codec agrees
    with pytest.raises(IOError, match="crc"):
        tfrecord.read_records(str(bad), verify_crc=True)


def test_native_error_on_garbage(tmp_path):
    bad = tmp_path / "bad.tfrecord"
    bad.write_bytes(b"not a gzip file at all")
    with pytest.raises(IOError):
        native.decode_file_into(str(bad), None, np.zeros((12, 1024), np.int32), None)
