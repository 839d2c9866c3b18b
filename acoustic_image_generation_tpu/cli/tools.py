"""Analysis-tool CLI: the reference's standalone script fleet as
subcommands.

    python -m acoustic_image_generation_tpu.cli.tools <cmd> ...

| subcommand | replaces (reference)                     |
|------------|------------------------------------------|
| iou        | iouenergythreshold.py (all 11 thresholds in ONE pass) |
| auc        | areaundercurve.py                        |
| knn        | knn.py (15-NN on exported latents)       |
| retrieve   | retrieve.py (rank-1/2/5/10/30)           |
| aggregate  | meanstd.py (5-seed trimmed mean +- std)  |
| extract    | extract_features_unetraces/_triplet.py   |

Artifacts keep the reference's file names (``intersection_{t}_accuracy.txt``,
``area.txt``, ``*_knn_value.txt``) so existing sweep tooling keeps working.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _strip(train_flags):
    """Drop the conventional ``--`` separator (argparse.REMAINDER keeps it).
    NOTE: options of the subcommand itself (e.g. ``--out_dir``) must come
    BEFORE the positional arguments — REMAINDER greedily captures everything
    after them."""
    return [f for f in train_flags if f != "--"]


def cmd_iou(args) -> int:
    """Real-vs-generated energy IoU sweep over the test split."""
    from acoustic_image_generation_tpu.cli.main import config_from_args, build_parser, make_loader, select_task
    from acoustic_image_generation_tpu.evaluation.localize import run_iou_sweep
    from acoustic_image_generation_tpu.train.trainer import Trainer

    main_args = build_parser().parse_args(_strip(args.train_flags))
    config = config_from_args(main_args)
    task = select_task(config)
    trainer = Trainer(task, config)
    loader = make_loader(config, "testing")
    first = None
    for first in loader.batches(0):
        break
    if first is None:
        print("empty training list: no batches to build a template from")
        return 2
    import jax

    template = jax.device_get(trainer.init_state(first))
    state = trainer.restore(args.checkpoint, template)
    out_dir = args.out_dir or trainer.run_dir
    res = run_iou_sweep(task, state, loader, out_dir)
    print(json.dumps({"auc": res["auc"], "fractions": {str(k): v for k, v in res["fractions"].items()}}))
    return 0


def cmd_auc(args) -> int:
    """AUC from existing intersection_{t}_accuracy.txt files
    (areaundercurve.py:26-40)."""
    from acoustic_image_generation_tpu.evaluation.iou import localization_auc

    fractions = {}
    for t in [round(0.1 * i, 1) for i in range(11)]:
        path = os.path.join(args.dir, f"intersection_{t}_accuracy.txt")
        with open(path) as f:
            fractions[t] = float(f.read().split()[1])
    auc = localization_auc(fractions)
    with open(os.path.join(args.dir, "area.txt"), "w") as f:
        f.write(f"{auc:6f}")
    print(auc)
    return 0


def cmd_knn(args) -> int:
    from acoustic_image_generation_tpu.evaluation.export import load_features
    from acoustic_image_generation_tpu.evaluation.knn import knn_accuracy

    train_x, train_y, _ = load_features(args.train_dir, "training")
    test_x, test_y, _ = load_features(args.test_dir, args.set)
    acc = knn_accuracy(train_x, train_y, test_x, test_y, k=args.k)
    out = os.path.join(args.test_dir, f"{args.set}_knn_value.txt")
    with open(out, "w") as f:
        f.write(f"{acc:6f}\n")
    print(acc)
    return 0


def cmd_retrieve(args) -> int:
    from acoustic_image_generation_tpu.evaluation.export import load_features
    from acoustic_image_generation_tpu.evaluation.retrieve import retrieval_ranks

    anchors, a_labels, _ = load_features(args.anchor_dir, args.set)
    gallery, g_labels, _ = load_features(args.gallery_dir, args.set)
    res = retrieval_ranks(anchors, a_labels, gallery, g_labels, args.num_classes)
    ranks = {k: v for k, v in res.items() if k.startswith("rank")}
    with open(os.path.join(args.anchor_dir, f"{args.set}_retrieval.txt"), "w") as f:
        f.write(json.dumps(ranks, indent=2))
    print(json.dumps(ranks))
    return 0


def cmd_aggregate(args) -> int:
    from acoustic_image_generation_tpu.evaluation.aggregate import aggregate_runs

    metric_values: dict[str, list[float]] = {}
    for path in args.files:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                # accept "name value" or bare floats (named by file)
                parts = line.split()
                if len(parts) >= 2:
                    try:
                        metric_values.setdefault(parts[0], []).append(float(parts[-1]))
                        continue
                    except ValueError:
                        pass
                try:
                    metric_values.setdefault(os.path.basename(path), []).append(float(parts[-1]))
                except ValueError:
                    continue
    out = aggregate_runs(metric_values, args.out)
    print(json.dumps(out, indent=2, sort_keys=True))
    return 0


def cmd_extract(args) -> int:
    """Export per-second latents of a trained embed model
    (extract_triplet.py protocol: z = mean + std*eps)."""
    import jax

    from acoustic_image_generation_tpu.cli.main import build_parser, config_from_args, make_loader, select_task
    from acoustic_image_generation_tpu.evaluation.export import export_features
    from acoustic_image_generation_tpu.train.trainer import Trainer

    main_args = build_parser().parse_args(_strip(args.train_flags))
    config = config_from_args(main_args)
    task = select_task(config)
    assert hasattr(task, "embeddings"), "extract requires an embedding task"
    trainer = Trainer(task, config)
    loader = make_loader(config, {"training": "training", "validation": "validation",
                                  "testing": "testing"}[args.set])
    first = None
    for first in loader.batches(0):
        break
    if first is None:
        print("empty training list: no batches to build a template from")
        return 2
    template = trainer.init_state(first)
    state = trainer.restore(args.checkpoint, template)

    feats: dict[str, list] = {}
    labels, scenario = [], []
    step = jax.jit(
        lambda raw, key: task.embeddings(
            state.params, state.batch_stats, trainer._prepare(raw), key,
            use_mean=args.mean,
        )
    )
    for i, raw_batch in enumerate(loader.batches(0)):
        raw = trainer.device_batch(raw_batch)
        z = jax.device_get(step(raw, jax.random.fold_in(jax.random.key(0), i)))
        n = raw_batch.valid
        for mod, arr in z.items():
            feats.setdefault(mod, []).append(np.asarray(arr)[:n])
        labels.append(raw_batch.action[:n])
        scenario.append(raw_batch.location[:n])
    epoch = os.path.basename(args.checkpoint).split("_")[1].split(".")[0]
    for mod, arrs in feats.items():
        export_features(
            args.out_dir, args.set, mod, epoch,
            np.concatenate(arrs), np.concatenate(labels), np.concatenate(scenario),
            config.data.num_classes, config.data.num_locations,
        )
    print(f"exported {sorted(feats)} to {args.out_dir}")
    return 0


def cmd_convert(args) -> int:
    """Raw capture directories -> TFRecord shards + list files
    (convert_data.py protocol)."""
    import glob as globmod

    from acoustic_image_generation_tpu.data.convert import (
        convert_capture_dir,
        write_list_files,
    )

    all_shards = []
    for raw_dir in sorted(globmod.glob(os.path.join(args.root_raw_dir, "class_*", "data_*"))):
        parts = raw_dir.rstrip("/").split("/")
        classes = int(parts[-2].split("_")[1])
        location = int(parts[-1].split("_")[1])
        shards = convert_capture_dir(
            raw_dir, args.out_dir, classes=classes, location=location,
            modalities=tuple(args.modalities),
        )
        all_shards.extend(shards)
        print(f"{raw_dir}: {len(shards)} shards")
    lists = write_list_files(args.out_dir, all_shards)
    print(json.dumps(lists))
    return 0


def cmd_reshard(args) -> int:
    """Rewrite GZIP shards uncompressed for maximum ingest throughput."""
    from acoustic_image_generation_tpu.data.convert import reshard

    print(reshard(args.list_file, args.out_dir))
    return 0


def cmd_convert_flickr(args) -> int:
    """FlickrSoundNet raw + XML boxes -> shards (convert_data2.py:196-311)."""
    from acoustic_image_generation_tpu.data.convert import convert_flickr

    list_path = convert_flickr(
        args.root_raw_dir, args.out_dir, modalities=tuple(args.modalities)
    )
    print(json.dumps({"testing": list_path}))
    return 0


def cmd_convert_ave(args) -> int:
    """AVE captures with event windows -> shards (convert_data3.py:168-288)."""
    from acoustic_image_generation_tpu.data.convert import (
        convert_ave,
        write_list_files,
    )

    shards = convert_ave(args.root_raw_dir, args.out_dir, modalities=tuple(args.modalities))
    lists = write_list_files(args.out_dir, shards)
    print(json.dumps(lists))
    return 0


def cmd_convert_collected(args) -> int:
    """2-object collected set -> shards (convert_data4.py:160-245)."""
    from acoustic_image_generation_tpu.data.convert import convert_collected

    list_path = convert_collected(
        args.root_raw_dir, args.out_dir, modalities=tuple(args.modalities)
    )
    print(json.dumps({"testing": list_path}))
    return 0


def cmd_show(args) -> int:
    """Qualitative energy overlays + channel grids of a generation
    checkpoint over the test split (showimages.py / decodeimages.py
    capability)."""
    import jax

    from acoustic_image_generation_tpu.cli.main import (
        build_parser as main_parser,
        config_from_args,
        make_loader,
        select_task,
    )
    from acoustic_image_generation_tpu.evaluation.iou import energy_mask
    from acoustic_image_generation_tpu.evaluation.overlay import save_overlay_grid
    from acoustic_image_generation_tpu.evaluation.plots import save_channel_grid
    from acoustic_image_generation_tpu.train.trainer import Trainer

    main_args = main_parser().parse_args(_strip(args.train_flags))
    config = config_from_args(main_args)
    task = select_task(config)
    trainer = Trainer(task, config)
    loader = make_loader(config, "testing")
    first = None
    for first in loader.batches(0):
        break
    if first is None:
        print("empty training list: no batches to build a template from")
        return 2
    state = jax.device_get(trainer.init_state(first))
    state = trainer.restore(args.checkpoint, state)

    raw = trainer.device_batch(first)
    batch = jax.jit(trainer._prepare)(raw)
    out, _ = jax.jit(
        lambda p, b, bt, k: task._forward(p, bt, b, {"latent": k}, train=False)
    )(state.params, batch, state.batch_stats, jax.random.key(0))
    real = np.asarray(batch.acoustic)
    gen = np.asarray(out.output, dtype=np.float32)
    video = np.asarray(batch.video)
    real_masks = np.asarray(energy_mask(real))
    gen_masks = np.asarray(energy_mask(gen))
    os.makedirs(args.out_dir, exist_ok=True)
    n = min(args.num_images, real.shape[0])
    for h in range(n):
        save_overlay_grid(
            os.path.join(args.out_dir, f"overlay_{h}.png"),
            video[h], real_masks[h], gen_masks[h],
        )
        save_channel_grid(
            os.path.join(args.out_dir, f"channels_{h}.png"), real[h], gen[h]
        )
    print(f"wrote {2 * n} images to {args.out_dir}")
    return 0


def cmd_show_video(args) -> int:
    """Per-frame energy-overlay renders over the whole test split
    (showvideo.py:201-233 driver): I_000001.png ... ready for ffmpeg."""
    import jax

    from acoustic_image_generation_tpu.cli.main import (
        build_parser as main_parser,
        config_from_args,
        make_loader,
        select_task,
    )
    from acoustic_image_generation_tpu.evaluation.show_video import (
        render_video_overlays,
    )
    from acoustic_image_generation_tpu.train.trainer import Trainer

    main_args = main_parser().parse_args(_strip(args.train_flags))
    config = config_from_args(main_args)
    task = select_task(config)
    trainer = Trainer(task, config)
    loader = make_loader(config, "testing")
    first = None
    for first in loader.batches(0):
        break
    if first is None:
        print("empty training list: no batches to build a template from")
        return 2
    state = jax.device_get(trainer.init_state(first))
    state = trainer.restore(args.checkpoint, state)
    paths = render_video_overlays(
        task, state, loader, args.out_dir, alpha=args.alpha
    )
    print(f"wrote {len(paths)} frames to {args.out_dir}")
    return 0


def cmd_export_tf1(args) -> int:
    """Export a trained checkpoint back to the reference's TF1 format
    (core/tf1_export): flagship generator+trunk, embed/joint per-modality
    VAEs, or DualCamNet — the file restores in the reference's own stack
    (``/root/reference/trainer/mfcctrainer.py:185-225`` per-scope init,
    its ``*_init_checkpoint`` warm starts, and its eval CLIs)."""
    import jax

    from acoustic_image_generation_tpu.cli.main import (
        build_parser as main_parser,
        config_from_args,
        make_loader,
        select_task,
    )
    from acoustic_image_generation_tpu.core.tf1_export import SCOPES, export_state
    from acoustic_image_generation_tpu.train.trainer import Trainer

    main_args = main_parser().parse_args(_strip(args.train_flags))
    config = config_from_args(main_args)
    task = select_task(config)
    trainer = Trainer(task, config)
    loader = make_loader(config, "training")
    first = None
    for first in loader.batches(0):
        break
    if first is None:
        print("empty training list: no batches to build a template from")
        return 2
    template = trainer.init_state(first)
    state = trainer.restore(args.checkpoint, template)
    params = jax.device_get(state.params)
    skipped = sorted(set(params) - set(SCOPES))
    if skipped:
        print(f"skipping non-reference model keys: {skipped}")
    out = export_state(
        params,
        jax.device_get(state.batch_stats),
        args.out_path,
        global_step=int(jax.device_get(state.step)),
    )
    print(out)
    return 0


def cmd_generate(args) -> int:
    """Serving path: batch-generate acoustic images from (mfcc, video)
    with a trained generator — the deployment counterpart of ``--mode
    test`` (no real acoustic images needed at input; the reference has no
    serving surface). Writes ``{set}_generated.npy`` (N,36,48,C) plus
    labels, and optionally the inverted ``{set}_energy.npy`` spatial maps
    (find_logen, iouenergythreshold.py:294-323).

    ``--artifact DIR`` serves from a StableHLO artifact written by
    ``export-serving`` instead of a checkpoint: the module (weights baked
    in) does the forward, and this command only feeds it loader batches.
    """
    import jax

    from acoustic_image_generation_tpu.cli.main import (
        build_parser as main_parser,
        config_from_args,
        make_loader,
        select_task,
    )
    from acoustic_image_generation_tpu.dsp.energy import find_logen
    from acoustic_image_generation_tpu.train.trainer import Trainer

    main_args = main_parser().parse_args(_strip(args.train_flags))
    config = config_from_args(main_args)
    task = select_task(config)
    assert hasattr(task, "generate"), "generate requires the generation recipe"
    trainer = Trainer(task, config)
    loader = make_loader(config, args.set)
    first = None
    for first in loader.batches(0):
        break
    if first is None:
        print("empty training list: no batches to build a template from")
        return 2

    if getattr(args, "artifact", None):
        from acoustic_image_generation_tpu.core import serving

        model = serving.load_artifact(args.artifact)
        if model.kind != "generation":
            print(f"--artifact points at a {model.kind} artifact; "
                  "generate needs a generation one")
            return 2
        if args.energy and not model.manifest["energy"]:
            print("artifact was exported without --energy")
            return 2
        import jax.numpy as jnp

        prepare = jax.jit(lambda raw: trainer._prepare(raw))

        def step(raw, i):
            batch = prepare(raw)
            out = model._call(
                batch.mfcc.astype(jnp.float32),
                batch.video.astype(jnp.float32),
                np.int32(config.run.seed + i),
            )
            return out if model.manifest["energy"] else (out[0],)

    else:
        template = trainer.init_state(first)
        state = trainer.restore(args.checkpoint, template)
        # honor --trunk_quant int8 in the serving path too: one-time
        # calibration from the first batch (docs/PERF.md int8 ladder)
        trainer._maybe_build_qtrunk(state, first)
        qtrunk = trainer._qtrunk

        def _serve(raw, key):
            batch = trainer._prepare(raw)
            gen = task.generate(
                state.params, state.batch_stats, batch.mfcc, batch.video, key,
                qtrunk=qtrunk,
            )
            return (gen, find_logen(gen)) if args.energy else (gen,)

        jit_serve = jax.jit(_serve)
        base = jax.random.key(config.run.seed)

        def step(raw, i):
            return jit_serve(raw, jax.random.fold_in(base, i))
    outs: list = []
    energies: list = []
    labels: list = []
    for i, raw_batch in enumerate(loader.batches(0)):
        raw = trainer.device_batch(raw_batch)
        result = step(raw, i)
        frames = raw_batch.acoustic.shape[1]
        n = raw_batch.valid * frames
        outs.append(np.asarray(result[0], np.float32)[:n])
        if args.energy:
            energies.append(np.asarray(result[1], np.float32)[:n])
        labels.append(np.repeat(raw_batch.action[: raw_batch.valid], frames))
    os.makedirs(args.out_dir, exist_ok=True)
    np.save(os.path.join(args.out_dir, f"{args.set}_generated.npy"), np.concatenate(outs))
    np.save(os.path.join(args.out_dir, f"{args.set}_labels.npy"), np.concatenate(labels))
    if args.energy:
        np.save(
            os.path.join(args.out_dir, f"{args.set}_energy.npy"), np.concatenate(energies)
        )
    total = sum(o.shape[0] for o in outs)
    print(f"generated {total} acoustic images -> {args.out_dir}")
    return 0


def cmd_export_serving(args) -> int:
    """Serialize a trained model into a self-contained StableHLO serving
    artifact (``core/serving.py``, docs/SERVING.md): weights baked in,
    batch dimension shape-polymorphic, runnable on the exported
    platforms with no model code or checkpoint plumbing. Dispatches on
    the recipe in the train flags — flagship generator, DualCamNet
    classifier, 3-VAE embedder, projection, or joint-MVAE. Pair with
    ``generate --artifact DIR`` or ``core.serving.load_artifact``."""
    from acoustic_image_generation_tpu.cli.main import (
        build_parser as main_parser,
        config_from_args,
        make_loader,
        select_task,
    )
    from acoustic_image_generation_tpu.core import serving
    from acoustic_image_generation_tpu.train.trainer import Trainer

    from acoustic_image_generation_tpu.train.classify import ClassificationTask
    from acoustic_image_generation_tpu.train.embed import EmbedTask
    from acoustic_image_generation_tpu.train.joint import JointTask
    from acoustic_image_generation_tpu.train.project import ProjectTask

    main_args = main_parser().parse_args(_strip(args.train_flags))
    config = config_from_args(main_args)
    task = select_task(config)
    is_gen = hasattr(task, "generate")
    is_cls = isinstance(task, ClassificationTask)
    is_emb = isinstance(task, EmbedTask)
    is_proj = isinstance(task, ProjectTask)
    is_joint = isinstance(task, JointTask)
    if not (is_gen or is_cls or is_emb or is_proj or is_joint):
        print(
            "export-serving supports the generation, classification, "
            f"embedding, projection and joint recipes; --train_flags "
            f"selected {type(task).__name__}"
        )
        return 2
    trainer = Trainer(task, config)
    loader = make_loader(config, "training")
    first = None
    for first in loader.batches(0):
        break
    if first is None:
        print("empty training list: no batches to build a template from")
        return 2
    template = trainer.init_state(first)
    state = trainer.restore(args.checkpoint, template)
    batch = "poly" if args.batch == "poly" else int(args.batch)
    platforms = tuple(args.platforms.split(","))
    ext = bool(args.external_weights)
    try:
        if is_gen:
            trainer._maybe_build_qtrunk(state, first)
            manifest = serving.export_generation(
                task,
                state,
                args.out_dir,
                energy=args.energy,
                qtrunk=trainer._qtrunk,
                batch=batch,
                platforms=platforms,
                spatial_shards=args.spatial_shards,
                external_weights=ext,
            )
        elif is_emb:
            manifest = serving.export_embedding(
                task, state, args.out_dir, use_mean=args.use_mean,
                batch=batch, platforms=platforms, external_weights=ext,
            )
        elif is_proj:
            manifest = serving.export_projection(
                task, state, args.out_dir, batch=batch, platforms=platforms,
                external_weights=ext,
            )
        elif is_joint:
            manifest = serving.export_joint(
                task, state, args.out_dir, batch=batch, platforms=platforms,
                external_weights=ext,
            )
        else:
            manifest = serving.export_classification(
                task, state, args.out_dir, batch=batch, platforms=platforms,
                external_weights=ext,
            )
    except ValueError as e:
        # Export-time contract violations (e.g. --energy on a 13-channel
        # recipe, non-divisible spatial shards) report like the rest of
        # this CLI: a message and exit code 2, not a traceback.
        print(f"export-serving: {e}")
        return 2
    print(
        f"exported {manifest['kind']} artifact:"
        f" {manifest['module_bytes']} StableHLO bytes"
        + (
            f" + {manifest['weights_bytes']} external weight bytes"
            if manifest.get("external_weights")
            else ""
        )
        + f" (platforms {','.join(manifest['platforms'])}) -> {args.out_dir}"
    )
    return 0


def cmd_serve(args) -> int:
    """Serve a StableHLO artifact over HTTP (``core/server.py``): npz
    request/response, ``/manifest`` + ``/healthz`` probes, execution
    serialized behind one lock. The network form of
    ``serving.load_artifact`` — deployment is "copy the artifact dir,
    run ``tools serve DIR``"."""
    from acoustic_image_generation_tpu.core.server import ArtifactServer

    try:
        server = ArtifactServer(
            args.artifact_dir, host=args.host, port=args.port,
            max_body_bytes=args.max_body_mb << 20,
        )
    except (FileNotFoundError, ValueError, RuntimeError) as e:
        print(f"serve: {e}")
        return 2
    print(
        f"serving {server.model.kind} artifact on "
        f"http://{server.host}:{server.port} (POST /call, GET /manifest)",
        flush=True,
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


def cmd_serve_info(args) -> int:
    """Print a serving artifact's manifest (kind, signature, platforms,
    weight digest, module size) without loading the module — the cheap
    way to identify an artifact before shipping it."""
    path = os.path.join(args.artifact_dir, "manifest.json")
    if not os.path.exists(path):
        print(f"no manifest.json under {args.artifact_dir}")
        return 2
    with open(path) as f:
        manifest = json.load(f)
    if args.json:
        print(json.dumps(manifest, indent=2))
        return 0
    kind = manifest.get("kind", "generation")
    print(f"format:    {manifest.get('format')}")
    print(f"kind:      {kind}")
    print(f"platforms: {','.join(manifest.get('platforms', []))}")
    print(f"batch:     {manifest.get('batch')}")
    for name, shape in manifest.get("inputs", {}).items():
        print(f"input:     {name} {shape}")
    print(f"outputs:   {', '.join(manifest.get('outputs', []))}")
    extras = {
        k: manifest[k]
        for k in ("energy", "spatial_shards", "trunk_quant", "num_classes",
                  "num_frames", "mfccmap", "latent_dim", "use_mean",
                  "encoder_type", "fusion", "variant")
        if k in manifest
    }
    for k, v in extras.items():
        print(f"{k + ':':<11}{v}")
    print(f"module:    {manifest.get('module_bytes', 0):,} bytes")
    print(f"weights:   sha256:{manifest.get('weights_sha256', '')[:16]}…")
    if manifest.get("external_weights"):
        print(f"external:  weights.msgpack {manifest.get('weights_bytes', 0):,} bytes")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="aig-tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("iou", help="energy-IoU threshold sweep + AUC")
    s.add_argument("checkpoint")
    s.add_argument("--out_dir", default=None)
    s.add_argument("train_flags", nargs=argparse.REMAINDER)
    s.set_defaults(fn=cmd_iou)

    s = sub.add_parser("auc", help="AUC from intersection_*.txt files")
    s.add_argument("dir")
    s.set_defaults(fn=cmd_auc)

    s = sub.add_parser("knn", help="15-NN latent classification")
    s.add_argument("train_dir")
    s.add_argument("test_dir")
    s.add_argument("--set", default="testing")
    s.add_argument("--k", type=int, default=15)
    s.set_defaults(fn=cmd_knn)

    s = sub.add_parser("retrieve", help="cross-modal rank-k retrieval")
    s.add_argument("anchor_dir")
    s.add_argument("gallery_dir")
    s.add_argument("--set", default="testing")
    s.add_argument("--num_classes", type=int, default=10)
    s.set_defaults(fn=cmd_retrieve)

    s = sub.add_parser("aggregate", help="multi-seed trimmed mean +- std")
    s.add_argument("files", nargs="+")
    s.add_argument("--out", default=None)
    s.set_defaults(fn=cmd_aggregate)

    s = sub.add_parser("convert", help="raw captures -> TFRecord shards")
    s.add_argument("root_raw_dir")
    s.add_argument("out_dir")
    s.add_argument("--modalities", nargs="*", type=int, default=[1, 2])
    s.set_defaults(fn=cmd_convert)

    s = sub.add_parser("reshard", help="rewrite shards uncompressed for ingest throughput")
    s.add_argument("list_file")
    s.add_argument("out_dir")
    s.set_defaults(fn=cmd_reshard)

    s = sub.add_parser(
        "convert-flickr",
        help="FlickrSoundNet raw (+XML boxes) -> TFRecord shards (convert_data2.py)",
    )
    s.add_argument("root_raw_dir")
    s.add_argument("out_dir")
    s.add_argument("--modalities", nargs="*", type=int, default=[1, 2])
    s.set_defaults(fn=cmd_convert_flickr)

    s = sub.add_parser(
        "convert-ave",
        help="AVE captures (event windows) -> TFRecord shards (convert_data3.py)",
    )
    s.add_argument("root_raw_dir")
    s.add_argument("out_dir")
    s.add_argument("--modalities", nargs="*", type=int, default=[1, 2])
    s.set_defaults(fn=cmd_convert_ave)

    s = sub.add_parser(
        "convert-collected",
        help="2-object collected set -> TFRecord shards (convert_data4.py)",
    )
    s.add_argument("root_raw_dir")
    s.add_argument("out_dir")
    s.add_argument("--modalities", nargs="*", type=int, default=[1, 2])
    s.set_defaults(fn=cmd_convert_collected)

    s = sub.add_parser("show", help="energy overlay + channel-grid renders")
    s.add_argument("checkpoint")
    s.add_argument("out_dir")
    s.add_argument("--num_images", type=int, default=4)
    s.add_argument("train_flags", nargs=argparse.REMAINDER)
    s.set_defaults(fn=cmd_show)

    s = sub.add_parser(
        "show-video",
        help="per-frame energy-overlay renders over the test split (showvideo.py)",
    )
    s.add_argument("checkpoint")
    s.add_argument("out_dir")
    s.add_argument("--alpha", type=float, default=0.7)
    s.add_argument("train_flags", nargs=argparse.REMAINDER)
    s.set_defaults(fn=cmd_show_video)

    s = sub.add_parser("generate", help="serving: mfcc+video -> generated acoustic images")
    s.add_argument("checkpoint")
    s.add_argument("out_dir")
    s.add_argument("--set", default="testing",
                   choices=["training", "validation", "testing"])
    s.add_argument("--energy", action="store_true",
                   help="also write inverted spatial energy maps")
    s.add_argument("--artifact", default=None,
                   help="serve from an export-serving StableHLO artifact "
                        "dir (checkpoint positional is then ignored)")
    s.add_argument("train_flags", nargs=argparse.REMAINDER)
    s.set_defaults(fn=cmd_generate)

    s = sub.add_parser(
        "export-serving",
        help="serialize a trained generator to a StableHLO serving artifact",
    )
    s.add_argument("checkpoint")
    s.add_argument("out_dir")
    s.add_argument("--energy", action="store_true",
                   help="bake the find_logen energy inversion in as a second output")
    s.add_argument("--use_mean", action="store_true",
                   help="embedding artifacts: export latent means instead "
                        "of sampled z (mean.py)")
    s.add_argument("--spatial_shards", type=int, default=1,
                   help="generation artifacts: bake the spatial-serving "
                        "layout over N devices (video height split + "
                        "GSPMD halo exchanges)")
    s.add_argument("--batch", default="poly",
                   help='"poly" (default, any batch size) or a fixed int')
    s.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated lowering platforms")
    s.add_argument("--external_weights", action="store_true",
                   help="ship weights in weights.msgpack beside a small "
                        "pure-program module instead of baking them in as "
                        "StableHLO constants (keeps the large projection/"
                        "joint modules a few MB)")
    s.add_argument("train_flags", nargs=argparse.REMAINDER)
    s.set_defaults(fn=cmd_export_serving)

    s = sub.add_parser(
        "serve", help="serve a StableHLO artifact over HTTP (npz in/out)"
    )
    s.add_argument("artifact_dir")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8321)
    s.add_argument("--max_body_mb", type=int, default=1024,
                   help="reject request bodies larger than this (413)")
    s.set_defaults(fn=cmd_serve)

    s = sub.add_parser("serve-info", help="print a serving artifact's manifest")
    s.add_argument("artifact_dir")
    s.add_argument("--json", action="store_true", help="raw manifest JSON")
    s.set_defaults(fn=cmd_serve_info)

    s = sub.add_parser(
        "export-tf1",
        help="export a trained flagship checkpoint as a reference TF1 .ckpt",
    )
    s.add_argument("checkpoint")
    s.add_argument("out_path", help="TF checkpoint path prefix to write")
    s.add_argument("train_flags", nargs=argparse.REMAINDER)
    s.set_defaults(fn=cmd_export_tf1)

    s = sub.add_parser("extract", help="export latents for knn/retrieval")
    s.add_argument("checkpoint")
    s.add_argument("out_dir")
    s.add_argument("--set", default="testing")
    s.add_argument("--mean", action="store_true",
                   help="export latent means instead of sampled z (mean.py)")
    s.add_argument("train_flags", nargs=argparse.REMAINDER)
    s.set_defaults(fn=cmd_extract)

    return p


def main(argv=None) -> int:
    from acoustic_image_generation_tpu.core.platform import honor_env_platforms

    honor_env_platforms()
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
