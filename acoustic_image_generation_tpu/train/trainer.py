"""Generic trainer: one jitted train/eval step + epoch loop + checkpoint gate.

Replaces the reference's eight near-duplicate trainer classes (SURVEY.md
§2.4) with one loop parametrized by a *task* object providing:

- ``init_variables(rng, batch) -> (params, batch_stats)``
- ``loss(params, batch_stats, batch, rngs, train) -> (loss, metrics, stats)``
- ``eval_losses(params, batch_stats, batch, rngs) -> (per_sample_dict, aux)``
- ``eval_metric`` — which eval loss gates best-epoch checkpointing
- optional ``param_labels(params)`` — optax.multi_transform labels for
  partially frozen graphs (e.g. the frozen generator of
  ``trainer_reconstructed_class.py:61``: label "frozen" -> zero updates)

TPU-first structure (vs ``/root/reference/trainer/*.py``):
- the whole step — preprocessing (MFCC, normalizations), forward, loss,
  backward, Adam update — is ONE jitted XLA program; the host only decodes
  bytes and enqueues (no per-step feed_dict / py_func round trips);
- batches are sharded over the ``data`` mesh axis, state is replicated;
  XLA inserts the gradient all-reduce over ICI from the sharding
  annotations;
- epoch bookkeeping mirrors the reference: per-epoch validation with
  size-weighted losses, best-val checkpoint + ``model.txt``,
  every-10-epochs snapshots, ``test_accuracy_{epoch}.txt`` on test.
"""

from __future__ import annotations

import os
import sys
import time
import weakref
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np
import optax

from acoustic_image_generation_tpu.core import rng as rng_mod
from acoustic_image_generation_tpu.core.config import ExperimentConfig
from acoustic_image_generation_tpu.data import preprocess
from acoustic_image_generation_tpu.parallel import (
    batch_sharding,
    fsdp_sharding,
    make_mesh,
    replicated_sharding,
    tp_sharding,
)
from acoustic_image_generation_tpu.parallel import mesh as mesh_mod
from acoustic_image_generation_tpu.train import checkpoint as ckpt
from acoustic_image_generation_tpu.train.state import TrainState


def _local_rows(garr) -> np.ndarray:
    """This process's contiguous row block of a leading-axis-sharded global
    array, as one host numpy array in row order. Used by the multi-host
    cached step to persist the local shard of freshly computed trunk
    features (the full global array is not process-addressable there).
    Duplicate shards (batch arrays replicated over a model axis) collapse
    to one copy per row block."""
    blocks: dict[int, np.ndarray] = {}
    for s in garr.addressable_shards:
        start = s.index[0].start or 0
        if start not in blocks:
            blocks[start] = np.asarray(s.data)
    return np.concatenate([blocks[k] for k in sorted(blocks)], axis=0)


class Trainer:
    def __init__(self, task, config: ExperimentConfig, mesh=None):
        self.task = task
        self.cfg = config
        tp = getattr(config.parallel, "tensor_parallel", 1)
        if config.parallel.fsdp and tp > 1:
            raise ValueError("fsdp and tensor_parallel are mutually exclusive")
        self.mesh = (
            mesh
            if mesh is not None
            else make_mesh(config.parallel.num_devices, model_parallel=tp)
        )
        self.run_dir = os.path.join(config.run.checkpoint_dir, config.run.exp_name)
        self.base_key = rng_mod.experiment_key(config.run.seed)

        lr = config.optim.learning_rate
        if getattr(config.optim, "tf1_adam", True):
            from acoustic_image_generation_tpu.train.optim import adam_tf1

            adam = adam_tf1(lr)
        else:
            adam = optax.adam(lr)
        if hasattr(task, "param_labels"):
            self.tx = optax.multi_transform(
                {"train": adam, "frozen": optax.set_to_zero()},
                task.param_labels,
            )
        else:
            self.tx = adam

        self._batch_sharding = batch_sharding(self.mesh)
        self._replicated = replicated_sharding(self.mesh)
        # int8 frozen-trunk program (models/quant.py): prepacked+calibrated
        # lazily from the first batch, then passed into the jitted steps.
        self._quant = getattr(task, "trunk_quant", "none") == "int8"
        self._qtrunk = None
        self._state_shardings = None  # set by init_state when fsdp is on
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)
        self._init = jax.jit(self._init_impl)

        # Frozen-trunk feature cache (train/feature_cache.py): active when
        # the config asks for it, the task exposes the trunk split, the
        # trunk is deterministic (trunk_bn="frozen"), and no
        # correspondence augmentation reshuffles batch rows.
        self.feature_cache = None
        self.device_cache = None
        self._feat_store_dtype = None
        if (
            getattr(config.model, "cache_trunk_features", False)
            and hasattr(task, "trunk_features")
            and getattr(task, "trunk_bn_frozen", False)
            and not config.data.correspondence
        ):
            from acoustic_image_generation_tpu.train.feature_cache import (
                TrunkFeatureCache,
            )

            feat_dt = getattr(config.model, "cache_features_dtype", "bf16")
            if feat_dt not in ("bf16", "f8_e4m3"):
                raise ValueError(
                    "cache_features_dtype must be 'bf16' or 'f8_e4m3', "
                    f"got {feat_dt!r}"
                )
            # None = store exactly what the trunk produces (its compute
            # dtype) — the bit-exact default. f8 halves every tier's
            # footprint; the upcast back to the compute dtype happens
            # inside the jitted cached steps (fused, free).
            self._feat_store_dtype = (
                jnp.float8_e4m3fn if feat_dt == "f8_e4m3" else None
            )
            self._feat_compute_dtype = (
                jnp.bfloat16
                if config.parallel.compute_dtype == "bfloat16"
                else jnp.float32
            )
            self.feature_cache = TrunkFeatureCache()
            # Validation/test features are just as cacheable as training
            # ones (same frozen trunk), but window ids are loader-local
            # indices — so each eval loader gets its own cache, keyed by
            # the loader object itself (lifetime-tied via weakref).
            self._eval_caches = weakref.WeakKeyDictionary()
            self._trunk_features = jax.jit(self._trunk_features_impl)
            self._train_step_cached = jax.jit(
                self._train_step_cached_impl, donate_argnums=(0,)
            )
            dev_bytes = getattr(config.model, "cache_device_bytes", 0)
            if jax.process_count() > 1:
                # Multi-host: each process keeps a host-RAM (+disk) tier
                # over ITS shard rows — window ids are global indices into
                # the shared window table (data/pipeline.py:308-338), so
                # keys stay stable; the global feature array is stitched
                # from per-host rows (form_global_batch). The HBM pool
                # tier stays off: its slot gathers assume every row is
                # process-addressable. After an epoch reshuffle a window
                # can migrate to another host's slice — that miss
                # recomputes (or disk-hits), which costs throughput only,
                # never correctness.
                dev_bytes = 0
            if dev_bytes > 0:
                from acoustic_image_generation_tpu.train.feature_cache import (
                    DeviceFeatureCache,
                )

                self.device_cache = DeviceFeatureCache(
                    dev_bytes, sharding=self._replicated
                )
                # same math as _train_step_cached, but the features are
                # gathered on device from the resident pool (no PCIe)
                self._train_step_cached_dev = jax.jit(
                    self._train_step_cached_dev_impl, donate_argnums=(0,)
                )
                # mixed-tier variant: resident rows gathered from the
                # pool, host rows scattered in (only the misses cross
                # PCIe). Missing-row counts are padded to powers of two
                # so at most log2(batch) variants ever compile.
                self._train_step_cached_mixed = jax.jit(
                    self._train_step_cached_mixed_impl, donate_argnums=(0,)
                )

    # ---------------------------------------------------------------- batch

    def _prepare(
        self, raw: dict, *, key=None, train: bool = True
    ) -> preprocess.Batch:
        """Flatten (N, F, ...) clips to frames and run device preprocessing
        (inside jit). ``key`` drives the music shuffled-pair correspondence
        (outdoor_data.py:854-902); the outdoor/mfcc silence-map variants
        are deterministic and ignore it."""
        f = raw["acoustic"].shape[1]
        flat = lambda x: x.reshape(-1, *x.shape[2:])
        music = self.cfg.data.datatype == "music"
        batch = preprocess.preprocess_batch(
            flat(raw["acoustic"]),
            flat(raw["audio"]),
            flat(raw["video"]),
            jnp.repeat(raw["action"], f),
            jnp.repeat(raw["location"], f),
            compute_filtered=self.cfg.data.correspondence and not music,
            use_pallas_mfcc=self.cfg.data.pallas_mfcc,
        )
        if self.cfg.data.correspondence:
            if music:
                # AVIA/music shuffled-pair correspondence; eval keeps the
                # concatenated half order so the per-half valid mask of
                # _eval_step_impl stays exact on padded remainder batches,
                # and constrains the pairing to real clips so no counted
                # row pairs with zero-filled padding
                batch = preprocess.correspondence_shuffle(
                    batch, key, frames=f, final_shuffle=train,
                    valid_clips=None if train else raw["valid"],
                )
            elif self.cfg.data.correspondence_video:
                batch = preprocess.correspondence_augment_no_video(batch)
            else:
                batch = preprocess.correspondence_augment(batch)
        return batch

    def device_batch(self, raw_batch) -> dict:
        """Host RawBatch -> sharded device arrays (+ valid count).

        Multi-process (host-sharded loader, ``DataConfig.host_shard``):
        each process contributes its local rows to one global array via
        ``parallel.form_global_batch``; ``valid`` becomes the global row
        count. Only full batches are supported across hosts (training's
        ``drop_remainder`` default) — a remainder batch's real rows are a
        per-host prefix, which the contiguous-prefix ``valid`` masking
        cannot describe globally.
        """
        arrays = {
            "acoustic": raw_batch.acoustic,
            "audio": raw_batch.audio,
            "video": raw_batch.video,
            "action": raw_batch.action,
            "location": raw_batch.location,
        }
        n_proc = jax.process_count()
        if n_proc == 1:
            out = {
                k: jax.device_put(v, self._batch_sharding)
                for k, v in arrays.items()
            }
            out["valid"] = jnp.int32(raw_batch.valid)
            return out
        if raw_batch.valid != raw_batch.action.shape[0]:
            raise ValueError(
                "multi-host training requires full batches "
                "(drop_remainder=True in the loader); got "
                f"{raw_batch.valid}/{raw_batch.action.shape[0]} real rows"
            )
        out = {
            k: mesh_mod.form_global_batch(v, self.mesh)
            for k, v in arrays.items()
        }
        out["valid"] = jnp.int32(raw_batch.valid * n_proc)
        return out

    # ---------------------------------------------------------------- steps

    def _init_impl(self, rng, raw):
        batch = self._prepare(raw, key=rng_mod.role_key(rng, "data"))
        params, batch_stats = self.task.init_variables(rng, batch)
        opt_state = self.tx.init(params)
        return TrainState(
            step=jnp.int32(0), params=params, batch_stats=batch_stats, opt_state=opt_state
        )

    def init_state(self, raw_batch) -> TrainState:
        raw = self.device_batch(raw_batch)
        key = rng_mod.role_key(self.base_key, "init")
        tp = getattr(self.cfg.parallel, "tensor_parallel", 1)
        if not self.cfg.parallel.fsdp and tp <= 1:
            state = self._init(key, raw)
            return jax.device_put(state, self._replicated)
        # Sharded state (FSDP over the data axis, or tensor parallel over
        # the model axis): derive per-leaf shardings from the state's
        # shapes — Adam moments share the params' shapes, so one rule
        # shards them all; jit then materializes the state directly in
        # that layout and the train step keeps it (out_shardings below).
        shapes = jax.eval_shape(self._init_impl, key, raw)
        if self.cfg.parallel.fsdp:
            self._state_shardings = fsdp_sharding(shapes, self.mesh)
        else:
            self._state_shardings = tp_sharding(shapes, self.mesh)
        init = jax.jit(self._init_impl, out_shardings=self._state_shardings)
        self._train_step = jax.jit(
            self._train_step_impl,
            donate_argnums=(0,),
            out_shardings=(self._state_shardings, None),
        )
        return init(key, raw)

    def _train_step_impl(self, state: TrainState, raw: dict, qtrunk=None):
        return self._step_core(state, raw, qtrunk=qtrunk)

    def _step_core(self, state: TrainState, raw: dict, *, qtrunk=None,
                   trunk_feat=None):
        """Shared body of the full and cached train steps: prepare,
        loss+grad, optimizer update, next TrainState. ``qtrunk`` routes
        the int8 trunk; ``trunk_feat`` bypasses the trunk entirely."""
        rngs = rng_mod.train_step_rngs(self.base_key, state.step)
        batch = self._prepare(raw, key=rngs["data"])
        kw = {}
        if qtrunk is not None:
            kw["qtrunk"] = qtrunk
        if trunk_feat is not None:
            if self._feat_store_dtype is not None:
                trunk_feat = trunk_feat.astype(self._feat_compute_dtype)
            kw["trunk_feat"] = trunk_feat

        def loss_fn(params):
            loss, metrics, new_stats = self.task.loss(
                params, state.batch_stats, batch, rngs, train=True, **kw
            )
            return loss, (metrics, new_stats)

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
            ),
            metrics,
        )

    def _trunk_features_impl(self, state: TrainState, video, qtrunk=None):
        """(N, F, 224, 298, 3) uint8 -> (N*F, 14, 19, 2048) frozen-trunk
        features at the stop_gradient boundary."""
        flat = video.reshape(-1, *video.shape[2:])
        feat = self.task.trunk_features(
            state.params, state.batch_stats, preprocess.normalize_video(flat), qtrunk
        )
        if self._feat_store_dtype is not None:
            # single production point of every cache tier: the storage
            # rounding (ModelConfig.cache_features_dtype) happens here once
            feat = feat.astype(self._feat_store_dtype)
        return feat

    def _train_step_cached_impl(self, state: TrainState, raw: dict, trunk_feat):
        """Train step consuming cached trunk features; the video tensor in
        ``raw`` is a dummy (the trunk never runs)."""
        return self._step_core(state, raw, trunk_feat=trunk_feat)

    def _train_step_cached_dev_impl(self, state: TrainState, raw: dict, buf, slots):
        """Cached train step fed from the HBM-resident feature pool:
        gather the batch's windows by slot index on device, then run the
        same head+generator step as _train_step_cached_impl."""
        feat = buf[slots]
        return self._train_step_cached_impl(
            state, raw, feat.reshape(-1, *feat.shape[2:])
        )

    def _train_step_cached_mixed_impl(
        self, state: TrainState, raw: dict, buf, slots, pos, rows
    ):
        """Mixed-tier cached step: start from the device pool's gather,
        overwrite the rows the pool lacks (``pos``) with host-cache rows
        (``rows``, the only feature bytes uploaded this step)."""
        feat = buf[slots].at[pos].set(rows)
        return self._train_step_cached_impl(
            state, raw, feat.reshape(-1, *feat.shape[2:])
        )

    def _eval_step_impl(
        self, state: TrainState, raw: dict, key, qtrunk=None, trunk_feat=None
    ):
        batch = self._prepare(raw, key=key, train=False)
        rngs = {"latent": key, "dropout": key, "moddrop": key}
        kw = {"qtrunk": qtrunk} if qtrunk is not None else {}
        if trunk_feat is not None:
            if self._feat_store_dtype is not None:
                trunk_feat = trunk_feat.astype(self._feat_compute_dtype)
            kw["trunk_feat"] = trunk_feat  # _forward prefers trunk_feat
        losses, _ = self.task.eval_losses(
            state.params, state.batch_stats, batch, rngs, **kw
        )
        n_total = next(iter(losses.values())).shape[0]
        # Correspondence augmentation CONCATENATES a second (fake) half onto
        # the batch (preprocess.correspondence_augment), so in a padded
        # remainder batch the real rows are a prefix of EACH half, not of
        # the whole vector — mask per half (outdoor_data_mfcc.py:888-928).
        halves = 2 if self.cfg.data.correspondence else 1
        per_clip = n_total // (raw["action"].shape[0] * halves)
        half_len = n_total // halves
        mask = (
            jnp.arange(n_total) % half_len < raw["valid"] * per_clip
        ).astype(jnp.float32)
        sums = {k: jnp.sum(v * mask) for k, v in losses.items()}
        return sums, jnp.sum(mask)

    # ---------------------------------------------------------------- loops

    def _maybe_build_qtrunk(self, state, raw_batch) -> None:
        """One-time int8 prepack + static-scale calibration of the frozen
        trunk (models/quant.py) from the first batch seen."""
        if not self._quant or self._qtrunk is not None:
            return
        video = jax.device_put(np.asarray(raw_batch.video), self._batch_sharding)
        flat = video.reshape(-1, *video.shape[2:])
        qt = self.task.build_qtrunk(
            state.params, state.batch_stats, preprocess.normalize_video(flat)
        )
        self._qtrunk = jax.device_put(jax.device_get(qt), self._replicated)

    def train_step(self, state, raw_batch):
        self._maybe_build_qtrunk(state, raw_batch)
        if (
            self.feature_cache is not None
            and getattr(raw_batch, "window_ids", None) is not None
        ):
            return self._train_step_with_cache(state, raw_batch)
        raw = self.device_batch(raw_batch)
        return self._train_step(state, raw, self._qtrunk)

    def _train_step_with_cache(self, state, raw_batch):
        from acoustic_image_generation_tpu.train import feature_cache as fc

        raw = self._cached_raw(raw_batch)
        if jax.process_count() > 1:
            # Multi-host: this process serves ITS rows from its host tier
            # (global window ids), then the global feature array is formed
            # from per-host rows exactly like the input batch. Misses run
            # the (sharded) trunk for the whole global batch and each host
            # persists its own shard's rows.
            feat = fc.gather_batch(
                self.feature_cache, raw_batch.window_ids, raw_batch.valid
            )
            if feat is not None:
                gfeat = mesh_mod.form_global_batch(feat, self.mesh)
            else:
                video = mesh_mod.form_global_batch(raw_batch.video, self.mesh)
                gfeat = self._trunk_features(state, video, self._qtrunk)
                self._persist_host_rows(
                    self.feature_cache, raw_batch, _local_rows(gfeat)
                )
            return self._train_step_cached(state, raw, gfeat)
        # tier 1: HBM-resident pool — gather by slot index on device;
        # rows the pool lacks are filled from the host tier so only the
        # misses cross PCIe (after a reshuffle most batches are mixed)
        if self.device_cache is not None:
            res = self.device_cache.lookup_partial(
                raw_batch.window_ids, raw_batch.valid
            )
            if res is not None:
                slots, missing = res
                if not missing:
                    return self._train_step_cached_dev(
                        state, raw, self.device_cache.buf, jnp.asarray(slots)
                    )
                host_rows = []
                for _, wid in missing:
                    f = self.feature_cache.get(wid)
                    if f is None:
                        host_rows = None
                        break
                    host_rows.append(f)
                if host_rows is not None:
                    m = len(missing)
                    mpad = 1 << (m - 1).bit_length()
                    pos = np.asarray(
                        [i for i, _ in missing]
                        + [missing[-1][0]] * (mpad - m),
                        np.int32,
                    )
                    rows = np.stack(host_rows + [host_rows[-1]] * (mpad - m))
                    return self._train_step_cached_mixed(
                        state,
                        raw,
                        self.device_cache.buf,
                        jnp.asarray(slots),
                        jnp.asarray(pos),
                        jnp.asarray(rows),
                    )
        # tier 2: host cache (re-uploads the batch's features)
        feat = fc.gather_batch(
            self.feature_cache, raw_batch.window_ids, raw_batch.valid
        )
        if feat is None:
            # tier 3: run the trunk once for this batch, then persist —
            # into the device pool while it has room, the host cache after
            video = jax.device_put(raw_batch.video, self._batch_sharding)
            feat = self._trunk_features(state, video, self._qtrunk)
            if self.device_cache is not None:
                self.device_cache.put_batch(
                    raw_batch.window_ids, raw_batch.valid, feat, raw_batch.frames
                )
            resident = self.device_cache.slots if self.device_cache else {}
            self._persist_host_rows(
                self.feature_cache, raw_batch, feat, skip=resident
            )
        else:
            feat = jax.device_put(feat, self._batch_sharding)
        return self._train_step_cached(state, raw, feat)

    def _persist_host_rows(self, cache, raw_batch, feat, skip=()) -> None:
        """Store a freshly computed batch of trunk features into a
        host-tier cache, one contiguous row per window; ``skip`` holds
        window ids resident elsewhere (the device pool). Stops at the
        cache's byte budget — later misses recompute."""
        f = raw_batch.frames
        host = None
        for i in range(raw_batch.valid):
            wid = int(raw_batch.window_ids[i])
            # pool-resident rows skip the RAM tier but still flow to the
            # cross-run disk tier (the pool dies with this process)
            ram = wid not in skip
            if (not ram or wid in cache) and (
                cache.disk is None or wid in cache.disk
            ):
                continue
            if host is None:
                host = np.asarray(jax.device_get(feat))
            # copy: a view would pin the whole batch array in RAM while
            # put() only charges the slice's bytes
            row = np.ascontiguousarray(host[i * f : (i + 1) * f])
            if not cache.put(wid, row, ram=ram):
                break

    def _attach_disk(self, loader, state, cache) -> None:
        """Attach the cross-run disk tier (ModelConfig.cache_disk_dir) to a
        host feature cache, keyed by a digest of the exact feature
        producer (frozen backbone, or the calibrated int8 trunk when quant
        is on) + the loader's window table. Idempotent; no-op until the
        int8 trunk is calibrated (its scales are part of the identity)."""
        root = getattr(self.cfg.model, "cache_disk_dir", None)
        if (
            not root
            or cache is None
            or cache.disk is not None
            or not hasattr(self.task, "trunk_state")
            or (self._quant and self._qtrunk is None)
        ):
            return
        from acoustic_image_generation_tpu.train import feature_cache as fc

        if self._qtrunk is not None:
            producer = fc.tree_fingerprint(self._qtrunk)
        else:
            producer = fc.tree_fingerprint(
                *self.task.trunk_state(state.params, state.batch_stats)
            )
        import hashlib

        # the storage dtype is part of the store identity: a bf16 and an
        # f8 run over the same trunk+windows must not share rows
        feat_dt = getattr(self.cfg.model, "cache_features_dtype", "bf16")
        fp = hashlib.blake2b(
            (producer + fc.windows_fingerprint(loader) + feat_dt).encode(),
            digest_size=20,
        ).hexdigest()
        cache.attach_disk(
            fc.DiskFeatureStore(
                root,
                fp,
                max_bytes=getattr(self.cfg.model, "cache_disk_bytes", 256 << 30),
            )
        )

    def _eval_features(self, state, raw_batch, cache):
        """Trunk features for an eval batch: gathered from the loader's
        host-tier cache, or computed once and persisted (the HBM pool is
        reserved for training windows). Returns a device array with the
        batch sharding."""
        from acoustic_image_generation_tpu.train import feature_cache as fc

        feat = fc.gather_batch(cache, raw_batch.window_ids, raw_batch.valid)
        if feat is not None:
            return jax.device_put(feat, self._batch_sharding)
        video = jax.device_put(raw_batch.video, self._batch_sharding)
        feat = self._trunk_features(state, video, self._qtrunk)
        self._persist_host_rows(cache, raw_batch, feat)
        return feat

    def _cached_raw(self, raw_batch) -> dict:
        """Batch upload for the cached step: the trunk never runs, so ship
        a 1x1 dummy video (drops the upload from ~150 MB to bytes).
        Multi-host, each process contributes its local rows to the global
        arrays exactly like :meth:`device_batch`."""
        n, f = raw_batch.video.shape[:2]
        arrays = {
            "acoustic": raw_batch.acoustic,
            "audio": raw_batch.audio,
            "video": np.zeros((n, f, 1, 1, 3), np.uint8),
            "action": raw_batch.action,
            "location": raw_batch.location,
        }
        n_proc = jax.process_count()
        if n_proc == 1:
            out = {
                k: jax.device_put(v, self._batch_sharding)
                for k, v in arrays.items()
            }
            out["valid"] = jnp.int32(raw_batch.valid)
            return out
        if raw_batch.valid != raw_batch.action.shape[0]:
            raise ValueError(
                "multi-host training requires full batches "
                "(drop_remainder=True in the loader); got "
                f"{raw_batch.valid}/{raw_batch.action.shape[0]} real rows"
            )
        out = {
            k: mesh_mod.form_global_batch(v, self.mesh)
            for k, v in arrays.items()
        }
        out["valid"] = jnp.int32(raw_batch.valid * n_proc)
        return out

    def evaluate(
        self, state: TrainState, loader, epoch: int = 0, *, use_cache: bool = True
    ) -> dict:
        """Size-weighted mean eval losses (trainer/*.py ``_evaluate``).

        Sums stay on device until the end so batches pipeline (a per-batch
        value fetch costs a full sync on tunneled TPUs). With the frozen-
        trunk feature cache on, validation rides it too: each eval loader
        gets its own host-tier cache (window ids are loader-local,
        budget = ``ModelConfig.cache_eval_bytes``), so per-epoch
        validation over a 50-100-epoch recipe pays the trunk once, not
        once per epoch. ``use_cache=False`` skips the caching entirely —
        right for one-shot evaluations (``test()``), where persisting
        features costs host RAM and device_get time for zero reuse."""
        sums: dict = {}
        count = None
        cache = None
        eval_bytes = getattr(self.cfg.model, "cache_eval_bytes", 8 << 30)
        if (
            use_cache
            and eval_bytes > 0
            and self.feature_cache is not None
            and jax.process_count() == 1
        ):
            from acoustic_image_generation_tpu.train.feature_cache import (
                TrunkFeatureCache,
            )

            cache = self._eval_caches.get(loader)
            if cache is None:
                cache = self._eval_caches[loader] = TrunkFeatureCache(eval_bytes)
        for i, raw_batch in enumerate(loader.batches(epoch)):
            self._maybe_build_qtrunk(state, raw_batch)
            if i == 0 and cache is not None:
                self._attach_disk(loader, state, cache)
            key = jax.random.fold_in(rng_mod.role_key(self.base_key, "latent"), i)
            if cache is not None and getattr(raw_batch, "window_ids", None) is not None:
                feat = self._eval_features(state, raw_batch, cache)
                raw = self._cached_raw(raw_batch)
                batch_sums, n = self._eval_step(state, raw, key, None, feat)
            else:
                raw = self.device_batch(raw_batch)
                batch_sums, n = self._eval_step(state, raw, key, self._qtrunk)
            for k, v in batch_sums.items():
                sums[k] = v if k not in sums else sums[k] + v
            count = n if count is None else count + n
        if count is None:
            return {}
        sums = jax.device_get(sums)
        count = max(float(jax.device_get(count)), 1.0)
        return {k: float(v) / count for k, v in sums.items()}

    def fit(self, train_loader, valid_loader, *, state: TrainState | None = None) -> TrainState:
        """Epoch loop. When resuming from a restored ``state``, epoch
        numbering continues from the step counter (the reference derives
        start_epoch from global_step, ``trainer/trainer.py:250``). A crash
        checkpoint (``interrupted_{N}`` + its ``.meta.json`` sidecar, read
        by :meth:`restore`) resumes at the exact batch it stopped on,
        replaying the epoch's seeded order up to that point — bit-exact
        for the bf16/f32 recipes (int8-trunk runs re-calibrate activation
        scales on the resumed epoch's data, so they resume in-family but
        not bit-identical). Ordinary checkpoints keep the reference's
        whole-epoch semantics."""
        cfg = self.cfg
        os.makedirs(self.run_dir, exist_ok=True)
        cfg.save(os.path.join(self.run_dir, "configuration.txt"))
        metrics_log = ckpt.MetricsWriter(self.run_dir)
        # Per-epoch media summaries like the reference's tf.summary.image
        # reconstruction panels (mfcctrainer.py:278-297), enabled by the
        # same flag (``tensorboard`` names the log dir upstream).
        media_logger = None
        if cfg.run.tensorboard:
            from acoustic_image_generation_tpu.utils.logger import Logger

            media_logger = Logger(
                os.path.join(cfg.run.tensorboard, cfg.run.exp_name)
            )
        tracker = ckpt.BestTracker(
            self.run_dir, cfg.run.exp_name, mode=getattr(self.task, "eval_mode", "min")
        )

        first = None
        start_epoch = 0
        skip_steps = 0
        if state is None:
            for first in train_loader.batches(0):
                break
            assert first is not None, "empty training loader"
            state = self.init_state(first)
        else:
            resume_meta, self._resume_meta = getattr(self, "_resume_meta", None), None
            if resume_meta is not None:
                # Crash-checkpoint resume: the sidecar records the exact
                # position, so no epoch-geometry guessing is involved. The
                # loader's per-epoch order is seeded and the per-step RNGs
                # key off ``state.step``, so skipping the batches the
                # interrupted run already consumed continues it bit-exactly
                # (skipped batches pay decode but no device time).
                start_epoch = int(resume_meta["epoch"])
                skip_steps = int(resume_meta["step_in_epoch"])
            else:
                steps_per_epoch = max(
                    train_loader.num_windows // train_loader.batch_size, 1
                )
                start_epoch = int(jax.device_get(state.step)) // steps_per_epoch

        # cross-run disk tier: needs the calibrated int8 trunk first when
        # quant is on (its scales are part of the feature identity)
        if (
            getattr(self.cfg.model, "cache_disk_dir", None)
            and self.feature_cache is not None
        ):
            if self._quant and self._qtrunk is None:
                if first is None:
                    for first in train_loader.batches(start_epoch):
                        break
                if first is not None:
                    self._maybe_build_qtrunk(state, first)
            self._attach_disk(train_loader, state, self.feature_cache)

        # snapshot checkpoints write on a background thread so the epoch
        # loop never blocks on device->host gather + file IO; closed (=
        # made durable) before fit returns or re-raises. Costs a transient
        # on-device state copy per save — RunConfig.async_checkpoint=False
        # restores the synchronous writer for HBM-edge runs.
        saver = (
            ckpt.AsyncCheckpointer()
            if getattr(cfg.run, "async_checkpoint", True)
            else None
        )
        try:
            for epoch in range(start_epoch, start_epoch + cfg.optim.num_epochs):
                t0 = time.time()
                skip_target = skip_steps
                n_steps = 0
                last_metrics: dict = {}
                metrics = None
                try:
                    for raw_batch in train_loader.batches(epoch):
                        if skip_steps:
                            # keep one-time derived state (int8 trunk
                            # calibration) flowing even while replaying
                            self._maybe_build_qtrunk(state, raw_batch)
                            skip_steps -= 1
                            continue
                        state, metrics = self.train_step(state, raw_batch)
                        n_steps += 1
                    # fetch once per epoch: pulling metric VALUES per step
                    # forces a device sync each step (very costly on
                    # tunneled TPUs); device arrays let steps pipeline
                    if metrics is not None:
                        last_metrics = {
                            k: float(v) for k, v in jax.device_get(metrics).items()
                        }
                except (KeyboardInterrupt, Exception):
                    # failure containment (SURVEY.md §5: the reference has
                    # none): persist the live state + exact epoch position
                    # so the run is resumable from the interrupted batch
                    # (synchronously — this process may be dying)
                    path = ckpt.save_checkpoint(
                        self.run_dir, f"interrupted_{epoch}", state
                    )
                    ckpt.save_resume_meta(
                        path,
                        epoch=epoch,
                        step_in_epoch=(skip_target - skip_steps) + n_steps,
                    )
                    raise
                dt = time.time() - t0
                val = self.evaluate(state, valid_loader, epoch)
                val_loss = val[self.task.eval_metric]
                clips_per_sec = n_steps * train_loader.batch_size / max(dt, 1e-9)
                metrics_log.write(
                    {
                        "epoch": epoch,
                        "train": last_metrics,
                        "valid": val,
                        "steps": n_steps,
                        "seconds": dt,
                        "clips_per_sec": clips_per_sec,
                    }
                )
                print(
                    f"{datetime.now()}: {cfg.run.exp_name} - Epoch: {epoch}\t"
                    f"Validation_{self.task.eval_metric}_Loss: {val_loss:6f}\t"
                    f"({clips_per_sec:.1f} clips/s)"
                )
                if media_logger is not None:
                    media_logger.log_scalars(
                        {f"valid/{k}": v for k, v in val.items()}, epoch
                    )
                    self._log_media(media_logger, state, valid_loader, epoch)
                is_best = tracker.update(epoch, val_loss)
                if epoch % 10 == 0 or is_best:
                    if saver is not None:
                        saver.save(self.run_dir, epoch, state)
                    else:
                        ckpt.save_checkpoint(self.run_dir, epoch, state)
        finally:
            unwinding = sys.exc_info()[1] is not None
            try:
                if saver is not None:
                    saver.close()
            except Exception as e:
                # don't let a deferred background-write error replace an
                # in-flight exception (e.g. the KeyboardInterrupt the
                # crash-checkpoint path is re-raising)
                if not unwinding:
                    raise
                print(f"WARNING: background checkpoint write failed: {e!r}")
            finally:
                if media_logger is not None:
                    media_logger.close()
        return state

    def _log_media(self, logger, state, valid_loader, epoch: int) -> None:
        """Reconstruction image panels for generation-style tasks
        (mfcctrainer.py:278-297: input acoustic vs generated output): the
        first validation example's mean-channel maps + its video frame."""
        if not hasattr(self.task, "eval_losses"):
            return
        for raw_batch in valid_loader.batches(epoch):
            break
        else:
            return
        raw = self.device_batch(raw_batch)
        key = rng_mod.role_key(self.base_key, "latent")

        if not hasattr(self, "_media_fn"):

            def media(state, raw, key):
                batch = self._prepare(raw, key=key, train=False)
                _, aux = self.task.eval_losses(
                    state.params, state.batch_stats, batch,
                    {"latent": key, "dropout": key, "moddrop": key},
                )
                return batch, aux

            self._media_fn = jax.jit(media)

        batch, aux = jax.device_get(self._media_fn(state, raw, key))
        aux = np.asarray(aux)
        if aux.ndim != 4:  # classification logits etc. — nothing to render
            return
        logger.log_image("valid/generated", aux[0].mean(-1), epoch, cmap="jet")
        real = np.asarray(batch.acoustic)
        if real.shape[1:3] == aux.shape[1:3]:
            logger.log_image("valid/real", real[0].mean(-1), epoch, cmap="jet")
        video = np.asarray(batch.video)
        if video.ndim == 4 and video.shape[-1] == 3 and video.shape[1] > 1:
            logger.log_image("valid/video", video[0], epoch)

    def test(self, state: TrainState, test_loader, epoch: int | None = None) -> dict:
        """Evaluate + write ``test_accuracy{_epoch}.txt`` like
        ``mfcctrainer.py:476-536``. One pass — caching features would
        cost RAM and transfers for zero reuse, so it is skipped."""
        results = self.evaluate(state, test_loader, use_cache=False)
        os.makedirs(self.run_dir, exist_ok=True)
        suffix = f"_{epoch}" if epoch is not None else ""
        with open(os.path.join(self.run_dir, f"test_accuracy{suffix}.txt"), "w") as f:
            parts = " - ".join(f"{k}: {v:6f}" for k, v in sorted(results.items()))
            f.write(f"{datetime.now()}: {self.cfg.run.exp_name} - {parts}\n")
        return results

    # ---------------------------------------------------------------- io

    def save(self, name, state):
        return ckpt.save_checkpoint(self.run_dir, name, state)

    def restore(self, path, template_state):
        # crash checkpoints carry a .meta.json sidecar with the exact
        # within-epoch position; fit() consumes it for mid-epoch resume
        self._resume_meta = ckpt.load_resume_meta(path)
        return ckpt.restore_checkpoint(path, template_state)
