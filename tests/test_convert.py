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


def test_framecount_video_time(tmp_path):
    """framecount.py capability: per-capture testing_file.txt +
    video_time.txt ('video seconds: N', the exact format convert_data.py
    :190-195 re-parses) + per-class class_time.txt."""
    from acoustic_image_generation_tpu.data.listing import framecount

    raw = tmp_path / "raw"
    for d, n in (("data_000", 3), ("data_001", 2)):
        cap = raw / "class_0" / d
        cap.mkdir(parents=True)
        for i in range(n):
            (cap / f"Data_{i + 1:03d}.tfrecord").write_bytes(b"x")
    out = tmp_path / "out"
    seconds = framecount(str(raw), str(out))
    assert list(seconds.values()) == [3, 2]
    cap0 = raw / "class_0" / "data_000"
    assert (cap0 / "video_time.txt").read_text() == "video seconds: 3"
    assert int(
        (cap0 / "video_time.txt").read_text().split(":")[1].strip()
    ) == 3  # convert_data.py:195 parse
    listed = (out / "class_0" / "data_000" / "testing_file.txt").read_text()
    assert listed.splitlines() == sorted(listed.splitlines())
    assert len(listed.splitlines()) == 3
    assert (raw / "class_0" / "class_time.txt").read_text() == "class seconds: 5"


def test_vggsound_video_list(tmp_path):
    """readcsv.py/csvtxt.py capability: filter the VGGSound csv by class
    subset + split and emit the videolista.txt download list."""
    from acoustic_image_generation_tpu.data.listing import vggsound_video_list

    csv_path = tmp_path / "vggsound.csv"
    csv_path.write_text(
        "url,seconds,class,set\n"
        "abc123,10,motorboat,test\n"
        "def456,5,motorboat,train\n"
        "ggg789,0,waterfall,test\n"
        "zzz000,0,dog barking,test\n"
    )
    out = tmp_path / "videolista.txt"
    lines = vggsound_video_list(str(csv_path), str(out), split="test")
    assert lines == [
        "motorboat",
        "https://www.youtube.com/watch?v=abc123",
        "waterfall",
        "https://www.youtube.com/watch?v=ggg789",
    ]
    assert out.read_text().strip().splitlines() == lines


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


# ------------------------------------------------- dataset-family converters


def _write_wav(path, seconds=1.5, fs=22050):
    from scipy.io import wavfile

    t = np.arange(int(seconds * fs))
    data = (10000 * np.sin(2 * np.pi * 440 * t / fs)).astype(np.int16)
    wavfile.write(path, fs, data)


def _write_image(path, size=(256, 256), seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (size[1], size[0], 3), np.uint8)
    Image.fromarray(img).save(path)


def _flickr_xml(path, name, boxes):
    import xml.etree.ElementTree as ET

    root = ET.Element("annotation")
    ET.SubElement(root, "file_name").text = name
    for (x0, y0, x1, y1, kind) in boxes:
        person = ET.SubElement(root, "person")
        bb = ET.SubElement(person, "bbox")
        ET.SubElement(bb, "type").text = kind
        ET.SubElement(bb, "xmin").text = str(x0)
        ET.SubElement(bb, "ymin").text = str(y0)
        ET.SubElement(bb, "xmax").text = str(x1)
        ET.SubElement(bb, "ymax").text = str(y1)
    import xml.etree.ElementTree as ET2

    ET2.ElementTree(root).write(path)


@pytest.fixture()
def flickr_raw(tmp_path):
    """Reference FlickrSoundNet raw layout (convert_data2.py:196-232)."""
    root = tmp_path / "flickr_raw"
    data = root / "Dataset" / "Data" / "0"
    ann = root / "Dataset" / "Annotations"
    data.mkdir(parents=True)
    ann.mkdir(parents=True)
    names = []
    for i in (3, 7):
        _write_image(str(data / f"{i}.jpg"), seed=i)
        _write_wav(str(data / f"{i}.wav"))
        _flickr_xml(
            str(ann / f"{i}.xml"),
            f"{i}.jpg",
            [(10, 20, 120, 200, "object"), (30, 40, 60, 90, "ambient sound")],
        )
        names.append(f"{i}.jpg")
    (root / "test_list.txt").write_text("\n".join(names) + "\n")
    return str(root)


def test_convert_flickr_roundtrip_boxes(flickr_raw, tmp_path):
    """convert_data2.py parity: raw jpg/wav/xml -> shards -> loader with
    include_boxes -> scaled (298/256, 224/256) int32 boxes per frame."""
    from acoustic_image_generation_tpu.data.convert import convert_flickr

    list_path = convert_flickr(flickr_raw, str(tmp_path / "out"))
    assert os.path.exists(list_path)
    loader = AcousticImageDataLoader(
        list_path, "testing", 2, include_boxes=True, drop_remainder=False
    )
    raw = next(iter(loader.batches(0)))
    assert raw.valid == 2
    assert raw.video.shape == (2, 12, 224, 298, 3)
    # box scaling: xmin 10 * 298/256 = 11.64 -> 12; ymax 200 * 224/256 = 175
    assert raw.extras["xmin"][0, 0, 0] == round(10 * 298 / 256)
    assert raw.extras["ymax"][0, 0, 0] == round(200 * 224 / 256)
    assert raw.extras["typescene"][0, 0, 0] == 1  # object
    assert raw.extras["typescene"][0, 0, 1] == 0  # ambient sound
    # third (absent) box slot stays zero
    assert raw.extras["xmax"][0, 0, 2] == 0
    # audio is resampled + chunked into (12, 1024) int32, nonzero
    assert raw.audio.shape == (2, 12, 1024)
    assert np.abs(raw.audio).max() > 0


@pytest.mark.slow
def test_convert_flickr_feeds_box_iou_sweep(flickr_raw, tmp_path):
    """The full reference eval path (showimages_bb.py): converted Flickr
    shards -> loader -> generation model -> weighted box IoU sweep +
    area.txt artifact."""
    import jax

    from acoustic_image_generation_tpu.core.config import (
        DataConfig, ExperimentConfig, ModelConfig, OptimConfig,
        ParallelConfig, RunConfig,
    )
    from acoustic_image_generation_tpu.data.convert import convert_flickr
    from acoustic_image_generation_tpu.evaluation.localize_boxes import (
        run_box_iou_sweep,
    )
    from acoustic_image_generation_tpu.train.generation import GenerationTask
    from acoustic_image_generation_tpu.train.trainer import Trainer

    list_path = convert_flickr(flickr_raw, str(tmp_path / "out"))
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=8, sample_length=1),
        model=ModelConfig(embedding=True, mfcc=True, resnet_units=(1, 1, 1, 1)),
        optim=OptimConfig(num_epochs=1),
        run=RunConfig(exp_name="flickr", checkpoint_dir=str(tmp_path)),
        parallel=ParallelConfig(compute_dtype="float32"),
    )
    loader = AcousticImageDataLoader(
        list_path, "testing", 8, include_boxes=True, drop_remainder=False
    )
    task = GenerationTask(cfg)
    trainer = Trainer(task, cfg)
    first = next(iter(loader.batches(0)))
    state = jax.device_get(trainer.init_state(first))
    res = run_box_iou_sweep(task, state, loader, str(tmp_path / "bb"))
    assert np.all(np.isfinite(res["iou"]))
    assert os.path.exists(os.path.join(str(tmp_path / "bb"), "area.txt"))


@pytest.fixture()
def ave_raw(tmp_path):
    """Reference AVE raw layout (convert_data3.py:181-230)."""
    from scipy.io import wavfile

    root = tmp_path / "ave_raw"
    cap = root / "class_3" / "data_002"
    (cap / "video").mkdir(parents=True)
    (cap / "audio").mkdir(parents=True)
    seconds = 3
    fs = 12 * 1024
    t = np.arange(seconds * fs)
    wav = (5000 * np.sin(2 * np.pi * 220 * t / fs)).astype(np.int16)
    wavfile.write(str(cap / "audio" / "output_audio2.wav"), fs, wav)
    for i in range(12 * seconds):
        _write_image(str(cap / "video" / f"I_{i + 1:06d}.bmp"), size=(640, 480), seed=i)
    (cap / "video_time.txt").write_text(f"time: {seconds}\n")
    (cap / "seconds.txt").write_text("1:2\n")
    return str(root)


def test_convert_ave_roundtrip_event(ave_raw, tmp_path):
    """convert_data3.py parity: capture dir + seconds.txt -> per-second
    shards with event=1 inside [start, end] (eventloader.py:262-264)."""
    from acoustic_image_generation_tpu.data.convert import convert_ave

    shards = convert_ave(ave_raw, str(tmp_path / "out"))
    assert len(shards) == 3
    list_path = str(tmp_path / "ave_list.txt")
    with open(list_path, "w") as f:
        f.write("\n".join(shards) + "\n")
    loader = AcousticImageDataLoader(
        list_path, "testing", 3, include_extras=("event",), drop_remainder=False,
        shuffle=False,
    )
    raw = next(iter(loader.batches(0)))
    assert raw.valid == 3
    # seconds.txt "1:2": second 0 -> 0, seconds 1-2 -> 1
    assert sorted(raw.extras["event"].tolist()) == [0, 1, 1]
    assert raw.action.tolist() == [3, 3, 3]
    assert raw.location.tolist() == [2, 2, 2]


@pytest.fixture()
def collected_raw(tmp_path):
    root = tmp_path / "collected_raw"
    root.mkdir()
    for i in (14, 20):
        _write_image(str(root / f"{i}.png"), seed=i)
        _write_wav(str(root / f"{i}.wav"))
    (root / "test_list.txt").write_text("14.png\n20.png\n")
    return str(root)


def test_convert_collected_roundtrip_classnumber(collected_raw, tmp_path):
    """convert_data4.py parity: flat png/wav dir -> shards with the
    hardcoded classnumber table (framesclass.py:247-248)."""
    from acoustic_image_generation_tpu.data.convert import (
        COLLECTED_CLASSNUMBERS,
        convert_collected,
    )

    list_path = convert_collected(collected_raw, str(tmp_path / "out"))
    loader = AcousticImageDataLoader(
        list_path, "testing", 2, include_extras=("classnumber",),
        drop_remainder=False, shuffle=False,
    )
    raw = next(iter(loader.batches(0)))
    assert raw.valid == 2
    got = sorted(raw.extras["classnumber"].tolist())
    want = sorted([COLLECTED_CLASSNUMBERS[13], COLLECTED_CLASSNUMBERS[19]])
    assert got == want
