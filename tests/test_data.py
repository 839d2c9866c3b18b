"""Tests for the TF-free TFRecord/SequenceExample ingest and host pipeline."""

import io
import os

import numpy as np
import pytest

from acoustic_image_generation_tpu.data import (
    AcousticImageDataLoader,
    decode_record,
    plan_windows,
)
from acoustic_image_generation_tpu.data import proto, synthetic, tfrecord


class TestCrc32c:
    def test_known_vectors(self):
        # RFC 3720 test vectors
        assert tfrecord.crc32c(b"123456789") == 0xE3069283
        assert tfrecord.crc32c(b"") == 0x0
        assert tfrecord.crc32c(b"\x00" * 32) == 0x8A9136AA

    def test_record_roundtrip(self):
        buf = io.BytesIO()
        payloads = [b"hello", b"", b"x" * 1000]
        for p in payloads:
            tfrecord.write_record(buf, p)
        buf.seek(0)
        assert list(tfrecord.iter_records(buf, verify_crc=True)) == payloads


class TestProto:
    def test_feature_roundtrip(self):
        for feat in [
            proto.Feature(bytes_list=[b"abc", b""]),
            proto.Feature(float_list=[1.5, -2.25, 0.0]),
            proto.Feature(int64_list=[0, 1, -1, 2**40, -(2**40)]),
        ]:
            decoded = proto.Feature.decode(feat.encode())
            assert decoded.bytes_list == feat.bytes_list
            assert decoded.int64_list == feat.int64_list
            if feat.float_list is not None:
                np.testing.assert_allclose(decoded.float_list, feat.float_list)

    def test_sequence_example_roundtrip(self):
        ex = proto.SequenceExample()
        ex.context["classes"] = proto.int64_feature(3)
        ex.context["location"] = proto.int64_feature(7)
        ex.feature_lists["audio/data"] = [
            proto.bytes_feature(b"\x01\x02"),
            proto.bytes_feature(b"\x03\x04"),
        ]
        got = proto.SequenceExample.decode(ex.encode())
        assert got.context["classes"].int64_list == [3]
        assert got.context["location"].int64_list == [7]
        assert [f.bytes_list[0] for f in got.feature_lists["audio/data"]] == [
            b"\x01\x02",
            b"\x03\x04",
        ]

    @pytest.mark.skipif(
        not pytest.importorskip("google.protobuf", reason="protobuf missing"),
        reason="protobuf missing",
    )
    def test_against_protobuf_runtime(self):
        """Cross-check wire bytes against the official protobuf runtime using
        a dynamically built SequenceExample descriptor."""
        from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

        pool = descriptor_pool.DescriptorPool()
        fdp = descriptor_pb2.FileDescriptorProto()
        fdp.name = "tfexample_test.proto"
        fdp.package = "tpb"

        def msg(name):
            m = fdp.message_type.add()
            m.name = name
            return m

        bl = msg("BytesList")
        f = bl.field.add(); f.name = "value"; f.number = 1; f.label = 3; f.type = 12
        il = msg("Int64List")
        f = il.field.add(); f.name = "value"; f.number = 1; f.label = 3; f.type = 3
        f.options.packed = True
        feat = msg("Feature")
        f = feat.field.add(); f.name = "bytes_list"; f.number = 1; f.label = 1; f.type = 11
        f.type_name = ".tpb.BytesList"
        f = feat.field.add(); f.name = "int64_list"; f.number = 3; f.label = 1; f.type = 11
        f.type_name = ".tpb.Int64List"
        feats = msg("Features")
        entry = feats.nested_type.add(); entry.name = "FeatureEntry"
        entry.options.map_entry = True
        f = entry.field.add(); f.name = "key"; f.number = 1; f.label = 1; f.type = 9
        f = entry.field.add(); f.name = "value"; f.number = 2; f.label = 1; f.type = 11
        f.type_name = ".tpb.Feature"
        f = feats.field.add(); f.name = "feature"; f.number = 1; f.label = 3; f.type = 11
        f.type_name = ".tpb.Features.FeatureEntry"
        fl = msg("FeatureList")
        f = fl.field.add(); f.name = "feature"; f.number = 1; f.label = 3; f.type = 11
        f.type_name = ".tpb.Feature"
        fls = msg("FeatureLists")
        entry = fls.nested_type.add(); entry.name = "FeatureListEntry"
        entry.options.map_entry = True
        f = entry.field.add(); f.name = "key"; f.number = 1; f.label = 1; f.type = 9
        f = entry.field.add(); f.name = "value"; f.number = 2; f.label = 1; f.type = 11
        f.type_name = ".tpb.FeatureList"
        f = fls.field.add(); f.name = "feature_list"; f.number = 1; f.label = 3; f.type = 11
        f.type_name = ".tpb.FeatureLists.FeatureListEntry"
        se = msg("SequenceExample")
        f = se.field.add(); f.name = "context"; f.number = 1; f.label = 1; f.type = 11
        f.type_name = ".tpb.Features"
        f = se.field.add(); f.name = "feature_lists"; f.number = 2; f.label = 1; f.type = 11
        f.type_name = ".tpb.FeatureLists"

        pool.Add(fdp)
        cls = message_factory.GetMessageClass(pool.FindMessageTypeByName("tpb.SequenceExample"))

        ours = proto.SequenceExample()
        ours.context["classes"] = proto.int64_feature(5)
        ours.feature_lists["audio/data"] = [proto.bytes_feature(b"\xde\xad")]

        theirs = cls()
        theirs.ParseFromString(ours.encode())
        assert theirs.context.feature["classes"].int64_list.value == [5]
        assert theirs.feature_lists.feature_list["audio/data"].feature[0].bytes_list.value == [b"\xde\xad"]

        # and decode their encoding
        back = proto.SequenceExample.decode(theirs.SerializeToString())
        assert back.context["classes"].int64_list == [5]


class TestSyntheticAndLoader:
    @pytest.fixture(scope="class")
    def dataset(self, tmp_path_factory):
        out = tmp_path_factory.mktemp("acivw")
        lists = synthetic.write_synthetic_dataset(
            str(out), num_classes=2, videos_per_class=1, seconds_per_video=4
        )
        return lists

    def test_record_decodes(self, dataset):
        with open(dataset["training"]) as f:
            path = f.readline().strip()
        payloads = tfrecord.read_records(path, verify_crc=True)
        assert len(payloads) == 1
        rec = decode_record(payloads[0])
        assert rec.acoustic.shape == (12, 36, 48, 12)
        assert rec.audio.shape == (12, 1024)
        assert rec.video.shape == (12, 224, 298, 3)

    def test_acoustic_flip_applied(self, dataset):
        with open(dataset["training"]) as f:
            path = f.readline().strip()
        payload = tfrecord.read_records(path)[0]
        flipped = decode_record(payload)
        raw = decode_record(payload, flip_acoustic=False)
        np.testing.assert_array_equal(flipped.acoustic, raw.acoustic[:, ::-1, ::-1, :])

    def test_windowing_counts(self, dataset):
        # 2 videos x 4 seconds, sample_length=2:
        # training sliding -> 3 windows per video; inference strided -> 2
        plan_tr = plan_windows(dataset["training"], "training", 2)
        plan_te = plan_windows(dataset["testing"], "testing", 2)
        assert len(plan_tr.windows) == 6
        assert len(plan_te.windows) == 4
        assert plan_tr.num_samples == 4  # floor(4/2) per video

    def test_loader_batches(self, dataset):
        loader = AcousticImageDataLoader(
            dataset["training"], "training", batch_size=2, sample_length=1, seed=0
        )
        batches = list(loader.batches(epoch=0))
        assert len(batches) == 4  # 8 windows / bs 2
        b = batches[0]
        assert b.acoustic.shape == (2, 12, 36, 48, 12)
        assert b.audio.shape == (2, 12, 1024)
        assert b.video.shape == (2, 12, 224, 298, 3)
        assert b.valid == 2

    def test_loader_shuffles_per_epoch(self, dataset):
        loader = AcousticImageDataLoader(
            dataset["training"], "training", batch_size=8, sample_length=1, seed=0
        )
        b0 = next(iter(loader.batches(epoch=0)))
        b1 = next(iter(loader.batches(epoch=1)))
        assert not np.array_equal(b0.action, b1.action) or not np.array_equal(
            b0.location, b1.location
        )

    def test_eval_remainder_padded(self, dataset):
        loader = AcousticImageDataLoader(
            dataset["testing"], "testing", batch_size=3, sample_length=1
        )
        batches = list(loader.batches())
        assert sum(b.valid for b in batches) == 8
        assert all(b.acoustic.shape[0] == 3 for b in batches)

    def test_host_sharded_loader_tiles_global_batches(self, dataset):
        """Two host shards (shard_index 0/1 of 2) must together reproduce
        the single-process loader's batches row-for-row: same global
        shuffled order, each host decoding only its contiguous slice."""
        mk = lambda **kw: AcousticImageDataLoader(
            dataset["training"], "training", batch_size=4,
            sample_length=1, seed=3, **kw
        )
        glob_loader = mk()
        shards = [mk(shard_index=i, shard_count=2) for i in range(2)]
        assert all(s.local_batch_size == 2 for s in shards)
        for epoch in (0, 1):  # shuffled orders must agree across hosts
            gb = list(glob_loader.batches(epoch))
            s0 = list(shards[0].batches(epoch))
            s1 = list(shards[1].batches(epoch))
            assert len(gb) == len(s0) == len(s1) == 2
            for g, a, b in zip(gb, s0, s1):
                assert a.valid == b.valid == 2 and g.valid == 4
                for field in ("acoustic", "audio", "video", "action",
                              "location", "window_ids"):
                    np.testing.assert_array_equal(
                        getattr(g, field),
                        np.concatenate(
                            [getattr(a, field), getattr(b, field)]
                        ),
                        err_msg=field,
                    )

    def test_host_sharded_remainder_keeps_hosts_in_lockstep(self, dataset):
        """A global remainder batch can leave a later shard with zero real
        rows; it must still yield a static-shape batch (same step count on
        every host) with valid=0."""
        mk = lambda **kw: AcousticImageDataLoader(
            dataset["testing"], "testing", batch_size=6, sample_length=1,
            **kw
        )
        glob_loader = mk()
        shards = [mk(shard_index=i, shard_count=2) for i in range(2)]
        gb = list(glob_loader.batches())
        s0 = list(shards[0].batches())
        s1 = list(shards[1].batches())
        # 8 testing windows, global bs 6 -> one full batch + remainder 2
        assert len(gb) == len(s0) == len(s1) == 2
        assert [b.valid for b in s0] == [3, 2]
        assert [b.valid for b in s1] == [3, 0]
        for g, a, b in zip(gb, s0, s1):
            assert a.acoustic.shape[0] == b.acoustic.shape[0] == 3
            joined = np.concatenate(
                [a.acoustic[: a.valid], b.acoustic[: b.valid]]
            )
            np.testing.assert_array_equal(g.acoustic[: g.valid], joined)
        # padded rows are zero-filled, ids stay well-formed
        assert not s1[-1].acoustic.any()
        assert s1[-1].window_ids.shape == (3,)

    def test_host_shard_validation(self, dataset):
        with pytest.raises(AssertionError):
            AcousticImageDataLoader(
                dataset["training"], "training", batch_size=5,
                shard_index=0, shard_count=2,
            )
        with pytest.raises(AssertionError):
            AcousticImageDataLoader(
                dataset["training"], "training", batch_size=4,
                shard_index=2, shard_count=2,
            )


def test_correspondence_shuffle_labels():
    """Shuffled-pair correspondence (outdoor_data.py:854-902)."""
    import jax
    import jax.numpy as jnp

    from acoustic_image_generation_tpu.data.preprocess import (
        Batch,
        correspondence_shuffle,
    )

    n = 16
    rng = np.random.default_rng(0)
    batch = Batch(
        acoustic=jnp.asarray(rng.random((n, 36, 48, 12), dtype=np.float32)),
        audio=jnp.asarray(rng.normal(size=(n, 1024)).astype(np.float32)),
        mfcc=jnp.asarray(rng.random((n, 12), dtype=np.float32)),
        video=jnp.asarray(rng.random((n, 8, 8, 3), dtype=np.float32)),
        action=jnp.asarray(rng.integers(0, 3, n).astype(np.int32)),
        location=jnp.asarray(rng.integers(0, 2, n).astype(np.int32)),
        filtered_mfcc=jnp.asarray(rng.random((n, 12), dtype=np.float32)),
    )
    out = correspondence_shuffle(batch, jax.random.key(0))
    assert out.acoustic.shape[0] == 2 * n
    labels = np.argmax(np.asarray(out.correspondence), axis=1)
    # every label-1 element must actually have matching (action, location)
    # possible between its audio-source and video-source; label-0 must not.
    # We can't reconstruct pairings post-permutation, but the label count
    # must be >= n (the aligned half always matches).
    assert labels.sum() >= n
    assert set(np.unique(labels)) <= {0, 1}


def test_correspondence_shuffle_valid_clips_excludes_padding():
    """Padded remainder batches (eval): with ``valid_clips`` the fake
    half's real rows must pair only with real clips, and padded positions
    must map to themselves — no counted row sees zero-filled partners."""
    import jax
    import jax.numpy as jnp

    from acoustic_image_generation_tpu.data.preprocess import (
        Batch,
        correspondence_shuffle,
    )

    n, valid = 8, 5
    rng = np.random.default_rng(1)
    # mark each clip's audio with its index; padded rows zeroed like the
    # loader's _assemble
    audio = np.zeros((n, 1024), np.float32)
    audio[:valid] = np.arange(1, valid + 1, dtype=np.float32)[:, None]
    batch = Batch(
        acoustic=jnp.asarray(rng.random((n, 36, 48, 12), dtype=np.float32)),
        audio=jnp.asarray(audio),
        mfcc=jnp.asarray(rng.random((n, 12), dtype=np.float32)),
        video=jnp.asarray(rng.random((n, 8, 8, 3), dtype=np.float32)),
        action=jnp.asarray(rng.integers(0, 3, n).astype(np.int32)),
        location=jnp.asarray(rng.integers(0, 2, n).astype(np.int32)),
        filtered_mfcc=jnp.asarray(rng.random((n, 12), dtype=np.float32)),
    )
    for key in range(6):
        out = correspondence_shuffle(
            batch, jax.random.key(key), final_shuffle=False,
            valid_clips=jnp.int32(valid),
        )
        fake_audio = np.asarray(out.audio[n:])
        # real rows of the fake half got a REAL partner's audio (nonzero
        # markers 1..valid), padded rows kept their own (zero) audio
        assert (fake_audio[:valid, 0] > 0).all()
        assert set(fake_audio[:valid, 0]) <= set(range(1, valid + 1))
        assert (fake_audio[valid:] == 0).all()
    # jit-safe with a traced valid count
    jax.jit(
        lambda b, k, v: correspondence_shuffle(
            b, k, final_shuffle=False, valid_clips=v
        )
    )(batch, jax.random.key(0), jnp.int32(valid))


def test_music_datakind_13_channels_no_flip(tmp_path):
    """AVIA/music: 13 channels, no parse-time flips (outdoor_data.py:46-49,
    :400-401)."""
    from acoustic_image_generation_tpu.data.pipeline import AcousticImageDataLoader
    from acoustic_image_generation_tpu.data.synthetic import write_synthetic_dataset

    lists = write_synthetic_dataset(
        str(tmp_path), num_classes=2, videos_per_class=1, seconds_per_video=1,
        num_channels=13,
    )
    loader = AcousticImageDataLoader(
        lists["testing"], "testing", 2, datakind="music", num_channels=13
    )
    batch = next(iter(loader.batches(0)))
    assert batch.acoustic.shape[-1] == 13
    # no flip: decode matches raw bytes
    from acoustic_image_generation_tpu.data.schema import decode_record
    from acoustic_image_generation_tpu.data.tfrecord import read_records

    with open(lists["testing"]) as f:
        path = f.readline().strip()
    rec = decode_record(read_records(path)[0], datakind="music", num_channels=13)
    np.testing.assert_array_equal(batch.acoustic[0, :12], rec.acoustic)


def test_event_and_classnumber_extras(tmp_path):
    """AVE event / 2-object classnumber context features flow through the
    loader (eventloader.py:262-264, framesclass.py:247-248)."""
    import os

    from acoustic_image_generation_tpu.data.convert import make_second_example
    from acoustic_image_generation_tpu.data.pipeline import AcousticImageDataLoader
    from acoustic_image_generation_tpu.data.tfrecord import write_records

    rng = np.random.default_rng(0)
    d = tmp_path / "ave" / "data_001"
    os.makedirs(d)
    for s in range(2):
        payload = make_second_example(
            classes=1, location=1,
            audio=rng.integers(-100, 100, (12, 1024)).astype(np.int32),
            video=rng.integers(0, 255, (12, 224, 298, 3)).astype(np.uint8),
            acoustic=np.zeros((12, 36, 48, 12), np.float32),
            event=5, classnumber=2,
        )
        write_records(str(d / f"Data_{s + 1:03d}.tfrecord"), [payload])
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(str(d / f"Data_{s + 1:03d}.tfrecord") for s in range(2)))
    loader = AcousticImageDataLoader(
        str(lst), "testing", 2, include_extras=("event", "classnumber")
    )
    batch = next(iter(loader.batches(0)))
    np.testing.assert_array_equal(batch.extras["event"], [5, 5])
    np.testing.assert_array_equal(batch.extras["classnumber"], [2, 2])


def test_audio_only_loading(tmp_path):
    """TUT/DCASE-style audio-only datasets (tut_data.py): modalities=(1,)."""
    from acoustic_image_generation_tpu.data.pipeline import AcousticImageDataLoader
    from acoustic_image_generation_tpu.data.synthetic import write_synthetic_dataset

    lists = write_synthetic_dataset(
        str(tmp_path), num_classes=2, videos_per_class=1, seconds_per_video=1
    )
    loader = AcousticImageDataLoader(lists["testing"], "testing", 2, modalities=(1,))
    batch = next(iter(loader.batches(0)))
    assert np.any(batch.audio != 0)
    assert not np.any(batch.acoustic)  # skipped modality stays zero
    assert not np.any(batch.video)


def test_tut_loader_crops_and_batches(tmp_path):
    """TUT/DCASE loader (tut_data.py): plain tf.Example shards with raw
    int64 label + float32 10 s waveform; training = random crops,
    inference = equispaced crops; optional global z-norm stats."""
    import numpy as np

    from acoustic_image_generation_tpu.data import tfrecord
    from acoustic_image_generation_tpu.data.tut import (
        SAMPLE_RATE, TUTDataLoader, decode_tut_record, encode_tut_record,
    )

    rng = np.random.default_rng(0)
    shard_dir = tmp_path / "tut"
    shard_dir.mkdir()
    for i in range(3):
        wav = rng.normal(size=10 * SAMPLE_RATE).astype(np.float32)
        tfrecord.write_records(
            str(shard_dir / f"rec{i}.tfrecords"), [encode_tut_record(wav, i % 2)],
            compression=None,
        )
    # codec round-trip
    wav2, label2 = decode_tut_record(encode_tut_record(wav, 7))
    assert label2 == 7 and np.array_equal(wav2, wav)

    train = TUTDataLoader(str(shard_dir), "training", 4, sample_length=2,
                          number_of_crops=5)
    assert train.num_samples == 3 * 5
    batches = list(train.batches(0))
    assert len(batches) == train.total_batches == 15 // 4
    audio, labels = batches[0]
    assert audio.shape == (4, 2 * SAMPLE_RATE) and labels.shape == (4,)

    infer = TUTDataLoader(str(shard_dir), "inference", 5, sample_length=2)
    assert infer.num_samples == 3 * 5  # 10s / 2s equispaced crops
    a, l = next(iter(infer.batches(0)))
    # first record's first crop is its waveform prefix (no shuffle)
    first_wav, first_label = decode_tut_record(train.records[0])
    assert np.array_equal(a[0], first_wav[: 2 * SAMPLE_RATE])

    # z-norm stats path (tut_data.py:46-48)
    stats = tmp_path / "stats"
    stats.mkdir()
    np.save(stats / "global_mean.npy", np.float32(0.5))
    np.save(stats / "global_std_dev.npy", np.float32(2.0))
    norm = TUTDataLoader(str(shard_dir), "inference", 5, sample_length=2,
                         normalize=True, stats_dir=str(stats))
    an, _ = next(iter(norm.batches(0)))
    np.testing.assert_allclose(an, (a - 0.5) / 2.0, rtol=1e-6)


def test_tut_spectrogram_geometry():
    """stft_magnitude with the TUT frame geometry (440/219/512) matches
    the NumPy oracle and tf.signal's frame-count rule."""
    import numpy as np

    from acoustic_image_generation_tpu.data.tut import spectrogram_params
    from acoustic_image_generation_tpu.dsp.spectrogram import (
        stft_magnitude, stft_magnitude_numpy_oracle,
    )

    wav = np.random.default_rng(1).normal(size=(2, 44100)).astype(np.float32)
    params = spectrogram_params()
    got = np.asarray(stft_magnitude(wav, **params))
    want = stft_magnitude_numpy_oracle(wav, **params)
    assert got.shape == want.shape == (2, 1 + (44100 - 440) // 219, 257)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_listing_framecount_and_csv_tools(tmp_path):
    """framecount.py / readcsv.py / readave.py list tooling."""
    import numpy as np

    from acoustic_image_generation_tpu.data.listing import (
        ave_capture_layout, framecount, vggsound_video_list,
    )

    # framecount over a tfrecord layout
    for c in (0, 1):
        for d in (1, 2):
            cap = tmp_path / "raw" / f"class_{c}" / f"data_{d:03d}"
            cap.mkdir(parents=True)
            for s in range(3):
                (cap / f"Data_{s:03d}.tfrecord").write_bytes(b"x")
    secs = framecount(str(tmp_path / "raw"), str(tmp_path / "lists"))
    assert all(v == 3 for v in secs.values()) and len(secs) == 4
    vt = (tmp_path / "raw" / "class_0" / "data_001" / "video_time.txt").read_text()
    assert vt == "video seconds: 3"
    ct = (tmp_path / "raw" / "class_0" / "class_time.txt").read_text()
    assert ct == "class seconds: 6"
    listed = (
        tmp_path / "lists" / "class_0" / "data_001" / "testing_file.txt"
    ).read_text().strip().splitlines()
    assert len(listed) == 3 and listed == sorted(listed)

    # VGGSound csv -> videolista.txt
    csv_path = tmp_path / "vgg.csv"
    csv_path.write_text(
        "url,class,set,seconds\n"
        "abc,waterfall sounds,test,10\n"
        "def,waterfall sounds,train,10\n"
        "ghi,people clapping,test,10\n"
        "jkl,motorboat,test,12\n"
    )
    lines = vggsound_video_list(str(csv_path), str(tmp_path / "videolista.txt"))
    assert lines == [
        "waterfall sounds",
        "https://www.youtube.com/watch?v=abc",
        "motorboat",
        "https://www.youtube.com/watch?v=jkl",
    ]

    # AVE csv -> capture layout with seconds.txt event windows
    ave_csv = tmp_path / "ave.csv"
    ave_csv.write_text(
        "Category&VideoID&Quality&StartTime&EndTime\n"
        "Church bell&v1&good&2&8\n"
        "Church bell&v2&good&0&10\n"
        "Barking&v3&good&1&5\n"
    )
    caps = ave_capture_layout(str(ave_csv), str(tmp_path / "ave_out"))
    assert len(caps) == 3
    cap0 = os.path.join(str(tmp_path / "ave_out"), "class_0", "data_000")
    assert caps[cap0][0] == "v1"
    assert open(os.path.join(cap0, "seconds.txt")).read() == "2:8\n"
    assert os.path.isdir(os.path.join(cap0, "video"))


def test_loader_window_cache_serves_epoch_two(tmp_path):
    """Epoch-level decoded-window cache (pipeline.cache_windows): epoch 0
    decodes from disk, epoch 1 serves identical batches from memory even
    if the shard files disappear."""
    import shutil

    from acoustic_image_generation_tpu.data.pipeline import AcousticImageDataLoader
    from acoustic_image_generation_tpu.data.synthetic import write_synthetic_dataset

    lists = write_synthetic_dataset(
        str(tmp_path / "ds"), num_classes=1, videos_per_class=2, seconds_per_video=2
    )
    loader = AcousticImageDataLoader(
        lists["training"], "training", 4, shuffle=False, cache_windows=True
    )
    first = [b.acoustic.copy() for b in loader.batches(0)]
    assert len(loader._window_cache) == loader.num_windows
    # delete the shards: epoch 1 must still decode (cache hit)
    shutil.rmtree(str(tmp_path / "ds"))
    second = [b.acoustic for b in loader.batches(1)]
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)


def test_loader_window_cache_respects_budget(tmp_path):
    """Cache stops at the byte budget and falls back to decoding."""
    from acoustic_image_generation_tpu.data.pipeline import AcousticImageDataLoader
    from acoustic_image_generation_tpu.data.synthetic import write_synthetic_dataset

    lists = write_synthetic_dataset(
        str(tmp_path / "ds"), num_classes=1, videos_per_class=2, seconds_per_video=2
    )
    probe = AcousticImageDataLoader(
        lists["training"], "training", 4, shuffle=False, cache_windows=True
    )
    list(probe.batches(0))
    one_window = probe._cache_bytes // len(probe._window_cache)

    loader = AcousticImageDataLoader(
        lists["training"], "training", 4, shuffle=False, cache_windows=True,
        cache_bytes=one_window * 2 + 1,
    )
    list(loader.batches(0))
    assert len(loader._window_cache) == 2  # budget caps at 2 windows
    # epoch 1 still works (mixed cache-hit + re-decode)
    batches = list(loader.batches(1))
    assert sum(b.valid for b in batches) == loader.num_windows
