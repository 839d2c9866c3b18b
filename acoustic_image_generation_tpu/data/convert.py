"""Raw capture -> TFRecord dataset conversion.

TF-free port of the converter family (``/root/reference/convert_data.py``;
variants 2-4 add boxes / classnumber / event context):

- video frames: aspect-preserving resize to smallest side 224 then central
  224x298 crop (``convert_data.py:60-158``), stored as raw uint8 bytes;
- audio: the synchronized wav split into 12 x 1024-sample chunks per second
  (``:221-228``), stored as raw int32 bytes;
- optional acoustic images (float32 frames) when the capture includes the
  beamformer output;
- directory layout ``{out}/class_{c}/data_{v:03d}/Data_{s:03d}.tfrecord``,
  one GZIP SequenceExample per second (``:245-279``);
- extra context features for the other datasets: FlickrSoundNet bounding
  boxes as int32 raw-byte per-frame sequence features
  (``convert_data2.py:225-262``), ``classnumber`` (``convert_data4.py``),
  ``event`` (``convert_data3.py``).

Image IO uses PIL, wav IO scipy; both host-side and outside the training
path.
"""

from __future__ import annotations

import os

import numpy as np

from acoustic_image_generation_tpu.data import proto, tfrecord

FRAMES_PER_SECOND = 12
NUM_SAMPLES = 1024
VIDEO_H, VIDEO_W = 224, 298


def aspect_preserving_resize(image: np.ndarray, smallest_side: int = 224) -> np.ndarray:
    """Bilinear resize so min(h, w) == smallest_side (convert_data.py:60-97)."""
    from PIL import Image

    h, w = image.shape[:2]
    scale = smallest_side / min(h, w)
    new_h, new_w = int(round(h * scale)), int(round(w * scale))
    return np.asarray(Image.fromarray(image).resize((new_w, new_h), Image.BILINEAR))


def central_crop(image: np.ndarray, crop_h: int, crop_w: int) -> np.ndarray:
    """(convert_data.py:120-138)."""
    h, w = image.shape[:2]
    oh = (h - crop_h) // 2
    ow = (w - crop_w) // 2
    return image[oh : oh + crop_h, ow : ow + crop_w, :]


def prepare_video_frame(image: np.ndarray) -> np.ndarray:
    """Raw frame -> (224, 298, 3) uint8."""
    image = aspect_preserving_resize(image, 224)
    image = central_crop(image, VIDEO_H, VIDEO_W)
    assert image.shape == (VIDEO_H, VIDEO_W, 3), image.shape
    return np.ascontiguousarray(image, dtype=np.uint8)


def read_wav(path: str) -> np.ndarray:
    """Mono waveform as int32 samples."""
    from scipy.io import wavfile

    _, data = wavfile.read(path)
    if data.ndim > 1:
        data = data[:, 0]
    return data.astype(np.int32)


NUM_MICS = 128


def read_dc_frame(path: str, *, num_mics: int = NUM_MICS,
                  num_samples: int = 1024) -> np.ndarray:
    """One raw dualcam audio capture (``A_{N:06d}.dc``): int32
    (mics, samples) stored Fortran-order (``video.py:41``)."""
    data = np.fromfile(path, np.int32)
    return data.reshape((num_mics, num_samples), order="F")


def mux_mic_wav(data_dir: str, out_path: str, mic_id: int,
                *, audio_subdir: str = "audio") -> str:
    """Extract one microphone's track from a capture's ``.dc`` files and
    write it as a normalized wav — the live path of the reference's
    ``video.py:29-54`` (its video/ffmpeg muxing half is commented out
    upstream). Reference quirks kept: files are 1-indexed, the waveform is
    peak-normalized to [-1, 1] (float samples), and the rate is written as
    ``_FPS * 1000`` = 12000 Hz (not the true 12288)."""
    from scipy.io import wavfile

    audio_dir = os.path.join(data_dir, audio_subdir)
    num_files = len([n for n in os.listdir(audio_dir) if n.endswith(".dc")])
    tracks = [
        read_dc_frame(os.path.join(audio_dir, f"A_{h + 1:06d}.dc"))[mic_id]
        for h in range(num_files)
    ]
    flat = np.concatenate(tracks).astype(np.float32)
    peak = abs(max(flat.min(), flat.max(), key=abs))
    flat = flat / peak if peak else flat
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    wavfile.write(out_path, FRAMES_PER_SECOND * 1000, flat)
    return out_path


def make_second_example(
    *,
    classes: int,
    location: int,
    audio: np.ndarray | None = None,  # (12, 1024) int32
    video: np.ndarray | None = None,  # (12, 224, 298, 3) uint8
    acoustic: np.ndarray | None = None,  # (12, 36, 48, C) float32
    boxes: dict | None = None,  # {xmin,xmax,ymin,ymax,typescene}: (12, 3) int32
    classnumber: int | None = None,
    event: int | None = None,
) -> bytes:
    """One second of synchronized data -> serialized SequenceExample
    matching the schema of every reference loader."""
    ex = proto.SequenceExample()
    ex.context["classes"] = proto.int64_feature(classes)
    ex.context["location"] = proto.int64_feature(location)
    if audio is not None:
        ex.context["audio_data/mics"] = proto.int64_feature(1)
        ex.context["audio_data/samples"] = proto.int64_feature(audio.shape[1])
        ex.feature_lists["audio/data"] = [
            proto.bytes_feature(np.ascontiguousarray(f, np.int32).tobytes()) for f in audio
        ]
    if video is not None:
        ex.context["video/height"] = proto.int64_feature(video.shape[1])
        ex.context["video/width"] = proto.int64_feature(video.shape[2])
        ex.context["video/depth"] = proto.int64_feature(video.shape[3])
        ex.feature_lists["video/image"] = [
            proto.bytes_feature(np.ascontiguousarray(f, np.uint8).tobytes()) for f in video
        ]
    if acoustic is not None:
        ex.context["audio_image/height"] = proto.int64_feature(acoustic.shape[1])
        ex.context["audio_image/width"] = proto.int64_feature(acoustic.shape[2])
        ex.context["audio_image/depth"] = proto.int64_feature(acoustic.shape[3])
        ex.feature_lists["audio/image"] = [
            proto.bytes_feature(np.ascontiguousarray(f, np.float32).tobytes()) for f in acoustic
        ]
    if boxes is not None:  # convert_data2.py: scaled int32 box features
        for key, arr in boxes.items():
            ex.feature_lists[key] = [
                proto.bytes_feature(np.ascontiguousarray(f, np.int32).tobytes()) for f in arr
            ]
    if classnumber is not None:
        ex.context["classnumber"] = proto.int64_feature(classnumber)
    if event is not None:
        ex.context["event"] = proto.int64_feature(event)
    return ex.encode()


def convert_capture_dir(
    raw_dir: str,
    out_dir: str,
    *,
    classes: int,
    location: int,
    modalities: tuple[int, ...] = (1, 2),
    wav_name: str = "audio/output_audio2.wav",
    frame_pattern: str = "video/I_{:06d}.bmp",
    video_time: int | None = None,
    event_window: tuple[int, int] | None = None,
) -> list[str]:
    """Convert one capture directory (reference layout:
    ``class_X/data_YYY/{video/*.bmp, audio/output_audio2.wav,
    video_time.txt}``) into per-second shards. Returns written paths.

    ``event_window=(start, end)`` adds the AVE ``event`` context label:
    1 for seconds with start <= sec <= end, else 0
    (``convert_data3.py:228-229``)."""
    from PIL import Image

    if video_time is None:
        with open(os.path.join(raw_dir, "video_time.txt")) as f:
            video_time = int(f.readline().split(":")[1].strip())
    include_audio = 1 in modalities
    include_video = 2 in modalities

    wav = read_wav(os.path.join(raw_dir, wav_name)) if include_audio else None
    out_data_dir = os.path.join(out_dir, f"class_{classes}", f"data_{location:03d}")
    os.makedirs(out_data_dir, exist_ok=True)

    written = []
    for sec in range(video_time):
        audio = video = None
        if include_audio:
            start = sec * FRAMES_PER_SECOND * NUM_SAMPLES
            audio = wav[start : start + FRAMES_PER_SECOND * NUM_SAMPLES].reshape(
                FRAMES_PER_SECOND, NUM_SAMPLES
            )
        if include_video:
            frames = []
            for i in range(FRAMES_PER_SECOND):
                idx = sec * FRAMES_PER_SECOND + i + 1
                img = np.asarray(Image.open(os.path.join(raw_dir, frame_pattern.format(idx))))
                frames.append(prepare_video_frame(img))
            video = np.stack(frames)
        event = None
        if event_window is not None:
            event = int(event_window[0] <= sec <= event_window[1])
        payload = make_second_example(
            classes=classes, location=location, audio=audio, video=video,
            event=event,
        )
        path = os.path.join(out_data_dir, f"Data_{sec + 1:03d}.tfrecord")
        tfrecord.write_records(path, [payload])
        written.append(path)
    return written


def resample_to_12288(data: np.ndarray, fs: int) -> np.ndarray:
    """Resample a waveform to the dualcam rate (12 fps x 1024 samples =
    12288 Hz). The reference uses ``librosa.core.resample``
    (``convert_data2.py:36``); this is the equivalent polyphase resampler
    (scipy.signal.resample_poly over the rate GCD)."""
    from math import gcd

    from scipy.signal import resample_poly

    if np.issubdtype(data.dtype, np.floating):
        # IEEE-float wav files carry samples in [-1, 1] (what
        # scipy.io.wavfile returns for float PCM); a plain int cast
        # would truncate every sample to 0 — rescale to int16 range
        data = np.clip(data, -1.0, 1.0) * 32767.0
    target = FRAMES_PER_SECOND * NUM_SAMPLES
    if fs == target:
        return np.round(data).astype(np.int32) if data.dtype.kind == "f" \
            else data.astype(np.int32)
    g = gcd(target, fs)
    out = resample_poly(data.astype(np.float64), target // g, fs // g)
    return np.round(out).astype(np.int32)


def _read_image(path: str, *, size: tuple[int, int] | None = None) -> np.ndarray:
    """Read an image as BGR uint8 (the reference reads with cv2, which is
    BGR — ``convert_data2.py:157``; the loader's normalize_video flips the
    channels back). ``size=(w, h)`` applies a direct bicubic resize like
    ``cv2.resize(image, (298, 224), INTER_CUBIC)`` (``convert_data2.py:165``)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if size is not None:
        img = img.resize(size, Image.BICUBIC)
    rgb = np.asarray(img, dtype=np.uint8)
    return rgb[..., ::-1]  # RGB -> BGR byte order, as stored by cv2


def parse_flickr_xml(xml_path: str, image_name: str) -> dict:
    """FlickrSoundNet annotation XML -> up to 3 boxes scaled onto the
    224x298 frame (``/root/reference/convert_data2.py:224-262``).

    Faithful quirks: the reference hardcodes the source geometry to
    256x256 (``rows = 256; cols = 256``) regardless of the actual image,
    scaling x by 298/256 and y by 224/256; ``type == 'object'`` maps to
    typescene 1, ``'ambient sound'`` to 0. Returns (3,) int32 arrays
    xmin/xmax/ymin/ymax/typescene (unused slots zero)."""
    import xml.etree.ElementTree as ET

    horizontal_scale = VIDEO_W / 256
    vertical_scale = VIDEO_H / 256
    root = ET.parse(xml_path).getroot()
    assert root.find("file_name").text == image_name, (xml_path, image_name)
    out = {k: np.zeros(3, np.int32)
           for k in ("xmin", "xmax", "ymin", "ymax", "typescene")}
    for num_p, member in enumerate(root.findall("person")[:3]):
        bndbox = member.find("bbox")
        out["typescene"][num_p] = 1 if bndbox.find("type").text == "object" else 0
        out["xmin"][num_p] = int(round(int(bndbox.find("xmin").text) * horizontal_scale))
        out["xmax"][num_p] = int(round(int(bndbox.find("xmax").text) * horizontal_scale))
        out["ymin"][num_p] = int(round(int(bndbox.find("ymin").text) * vertical_scale))
        out["ymax"][num_p] = int(round(int(bndbox.find("ymax").text) * vertical_scale))
    return out


def _one_second_audio(wav_12288: np.ndarray) -> np.ndarray:
    """First second of a 12288 Hz waveform as (12, 1024) int32, zero-padded
    when shorter."""
    need = FRAMES_PER_SECOND * NUM_SAMPLES
    buf = np.zeros(need, np.int32)
    n = min(len(wav_12288), need)
    buf[:n] = wav_12288[:n]
    return buf.reshape(FRAMES_PER_SECOND, NUM_SAMPLES)


def convert_flickr(root_raw_dir: str, out_dir: str,
                   *, modalities: tuple[int, ...] = (1, 2)) -> str:
    """FlickrSoundNet raw -> TFRecord shards + test list
    (``/root/reference/convert_data2.py:196-311``).

    Reads ``{root}/test_list.txt`` and, for every listed jpg under
    ``{root}/Dataset/Data/*/``, converts the wav (resampled to 12288 Hz),
    the jpg (direct 298x224 bicubic resize, ``:165``), and the XML boxes
    (``parse_flickr_xml``). Layout normalization vs the reference (which
    stores ONE frame + the full-length audio per record): records here
    hold one *second* — the frame tiled 12x, the first 12x1024 audio
    samples, and the boxes per frame — the layout every loader in this
    framework consumes (and what the reference's nr_frames=1 eval slices
    out again, ``showimages_bb.py:24,87-94``). Returns the written list
    file path (``{root}/test.txt`` equivalent: ``{out}/testing.txt``)."""
    import glob as _glob

    with open(os.path.join(root_raw_dir, "test_list.txt")) as f:
        test_list = {line.strip() for line in f if line.strip()}
    include_audio = 1 in modalities
    include_video = 2 in modalities
    os.makedirs(out_dir, exist_ok=True)
    written = []
    data_dirs = sorted(_glob.glob(os.path.join(root_raw_dir, "Dataset", "Data", "*/")))
    for data_dir in data_dirs:
        for image in sorted(os.listdir(data_dir)):
            if not image.endswith(".jpg") or image not in test_list:
                continue
            num = image[: -len(".jpg")]
            boxes3 = parse_flickr_xml(
                os.path.join(root_raw_dir, "Dataset", "Annotations", f"{num}.xml"),
                image,
            )
            boxes = {k: np.tile(v, (FRAMES_PER_SECOND, 1)) for k, v in boxes3.items()}
            audio = None
            if include_audio:
                from scipy.io import wavfile

                fs, data = wavfile.read(os.path.join(data_dir, f"{num}.wav"))
                if data.ndim > 1:
                    data = data[:, 0]
                audio = _one_second_audio(resample_to_12288(data, fs))
            video = None
            if include_video:
                frame = _read_image(
                    os.path.join(data_dir, image), size=(VIDEO_W, VIDEO_H)
                )
                video = np.tile(frame[None], (FRAMES_PER_SECOND, 1, 1, 1))
            payload = make_second_example(
                classes=0, location=0, audio=audio, video=video, boxes=boxes
            )
            path = os.path.join(out_dir, f"{num}.tfrecord")
            tfrecord.write_records(path, [payload])
            written.append(path)
    list_path = os.path.join(out_dir, "testing.txt")
    with open(list_path, "w") as f:
        for p in written:
            f.write(p + "\n")
    return list_path


def convert_ave(root_raw_dir: str, out_dir: str,
                *, modalities: tuple[int, ...] = (1, 2)) -> list[str]:
    """AVE raw captures -> per-second TFRecord shards with the ``event``
    context label (``/root/reference/convert_data3.py:168-288``).

    Walks ``{root}/*/*/video/`` capture dirs; class id comes from the
    ``class_N`` path element, location from ``data_NNN``; ``video_time.txt``
    gives the clip length and ``seconds.txt`` the ``start:end`` window in
    which the audio-visual event is active — seconds inside [start, end]
    get event=1 (``:228-229``). Output layout
    ``{out}/class_{c}/data_{v:03d}/Data_{s:03d}.tfrecord``."""
    import glob as _glob
    import re

    written = []
    for video_dir in sorted(_glob.glob(os.path.join(root_raw_dir, "*", "*", "video/"))):
        capture = os.path.dirname(os.path.dirname(video_dir))
        parts = capture.split(os.sep)
        classes = int(next(p for p in parts if re.match(r"class_", p)).split("_")[1])
        location = int(next(p for p in parts if re.match(r"data_", p)).split("_")[1])
        with open(os.path.join(capture, "seconds.txt")) as f:
            t = f.read().strip()
            start, end = int(t.split(":")[0]), int(t.split(":")[1])
        with open(os.path.join(capture, "video_time.txt")) as f:
            video_time = int(f.readline().split(":")[1].strip())
        paths = convert_capture_dir(
            capture, out_dir, classes=classes, location=location,
            modalities=modalities, video_time=video_time,
            event_window=(start, end),
        )
        written.extend(paths)
    return written


# 2-object collected set: file number -> class id
# (/root/reference/convert_data4.py:181).
COLLECTED_CLASSNUMBERS = (9, 9, 9, 9, 9, 9, 2, 9, 9, 4, 6, 7, 6, 1, 1, 8, 8,
                          2, 2, 0, 2, 3, 5)


def convert_collected(root_raw_dir: str, out_dir: str,
                      *, modalities: tuple[int, ...] = (1, 2)) -> str:
    """2-object collected set -> TFRecord shards with the ``classnumber``
    context feature (``/root/reference/convert_data4.py:160-245``): a flat
    directory of ``N.png`` + ``N.wav`` pairs filtered by
    ``{root}/test_list.txt``; classnumber = COLLECTED_CLASSNUMBERS[N-1].
    Same one-second layout normalization as ``convert_flickr``. Returns
    the written list file."""
    with open(os.path.join(root_raw_dir, "test_list.txt")) as f:
        test_list = {line.strip() for line in f if line.strip()}
    include_audio = 1 in modalities
    include_video = 2 in modalities
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for image in sorted(os.listdir(root_raw_dir)):
        if not image.endswith(".png") or image not in test_list:
            continue
        num = int(image[: -len(".png")])
        audio = None
        if include_audio:
            from scipy.io import wavfile

            fs, data = wavfile.read(os.path.join(root_raw_dir, f"{num}.wav"))
            if data.ndim > 1:
                data = data[:, 0]
            audio = _one_second_audio(resample_to_12288(data, fs))
        video = None
        if include_video:
            frame = _read_image(
                os.path.join(root_raw_dir, image), size=(VIDEO_W, VIDEO_H)
            )
            video = np.tile(frame[None], (FRAMES_PER_SECOND, 1, 1, 1))
        payload = make_second_example(
            classes=0, location=0, audio=audio, video=video,
            classnumber=int(COLLECTED_CLASSNUMBERS[num - 1]),
        )
        path = os.path.join(out_dir, f"{num}.tfrecord")
        tfrecord.write_records(path, [payload])
        written.append(path)
    list_path = os.path.join(out_dir, "testing.txt")
    with open(list_path, "w") as f:
        for p in written:
            f.write(p + "\n")
    return list_path


def write_list_files(out_dir: str, shard_paths: list[str], splits=(0.7, 0.15, 0.15)) -> dict:
    """Emit training/validation/testing list files over whole videos (the
    reference splits by capture directory, not by second)."""
    by_dir: dict[str, list[str]] = {}
    for p in sorted(shard_paths):
        by_dir.setdefault(os.path.dirname(p), []).append(p)
    dirs = sorted(by_dir)
    n = len(dirs)
    n_train = max(int(n * splits[0]), 1)
    n_valid = max(int(n * splits[1]), 1) if n > 2 else 0
    groups = {
        "training": dirs[:n_train],
        "validation": dirs[n_train : n_train + n_valid],
        "testing": dirs[n_train + n_valid :],
    }
    lists = {}
    os.makedirs(os.path.join(out_dir, "lists"), exist_ok=True)
    for split, ds in groups.items():
        path = os.path.join(out_dir, "lists", f"{split}.txt")
        with open(path, "w") as f:
            for d in ds:
                for p in by_dir[d]:
                    f.write(p + "\n")
        lists[split] = path
    return lists


def reshard(list_file: str, out_dir: str, *, compression: str | None = None) -> str:
    """Rewrite a dataset's shards (default: uncompressed) for ingest
    throughput — gzip inflate dominates single-core decode (SURVEY.md §7
    hard part 4). Directory structure under ``out_dir`` mirrors the last
    two path components; returns the new list file path."""
    from acoustic_image_generation_tpu.data import tfrecord

    new_paths = []
    with open(list_file) as f:
        paths = [line.strip() for line in f if line.strip()]
    for path in paths:
        records = tfrecord.read_records(path)
        parts = path.rstrip("/").split("/")
        dest_dir = os.path.join(out_dir, parts[-3], parts[-2])
        os.makedirs(dest_dir, exist_ok=True)
        dest = os.path.join(dest_dir, parts[-1])
        tfrecord.write_records(dest, records, compression=compression)
        new_paths.append(dest)
    new_list = os.path.join(out_dir, os.path.basename(list_file))
    with open(new_list, "w") as f:
        f.write("\n".join(new_paths) + "\n")
    return new_list
