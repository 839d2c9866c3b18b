"""Frozen-trunk feature cache: compute the ResNet trunk once per window.

The reference trains the AAAI'21 generator against a *frozen* ResNet50
backbone — its ``var_list`` is the UNet plus conv_map/logits only
(``/root/reference/models/vision.py:68-71``,
``/root/reference/trainer/mfcctrainer.py:64``) — yet still pays a full
trunk forward every step. With ``trunk_bn="frozen"``
(core/config.ModelConfig) the trunk is a deterministic function of each
video frame, so its output at the stop_gradient boundary (block4, the
input to the trainable conv_map) can be computed once per window per
dataset and reused every epoch. This is the classic frozen-backbone
production optimization: steady-state training then runs at generator
speed instead of trunk speed (measured 254 ms -> ~70 ms per 64-clip step
on v5e; see docs/PERF.md).

The cache is host-side NumPy keyed by the loader's stable window index
(``RawBatch.window_ids``), bounded by ``max_bytes``; windows that do not
fit keep taking the full-trunk path, so the cache degrades gracefully to
round-1 behavior. Features are stored in bfloat16 (1.09 MB/frame at
14x19x2048) — half the f32 footprint, exactly the dtype the head
consumes on TPU.

Window ids are loader-local indices, so each loader needs its own cache:
the Trainer keeps one for the training loader plus a per-eval-loader map
(validation features are just as reusable across the per-epoch
validations of a 50-100-epoch recipe). Validity rests on the frozen-trunk
invariant — with ``freeze_trunk`` + ``trunk_bn="frozen"`` neither trunk
params nor trunk BN stats ever change within a Trainer's lifetime, which
``tests/test_trainer.py::test_trunk_bn_frozen_disables_stat_updates``
pins.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

import jax.numpy as jnp


class TrunkFeatureCache:
    """Bounded host cache: window id -> (frames, 14, 19, 2048) bf16.

    With a ``disk`` store attached (:class:`DiskFeatureStore`, via the
    constructor or :meth:`attach_disk`), the cache writes every row
    through to disk and falls back to it on RAM misses — the cross-RUN
    tier: the reference protocol trains 5 seeds x many variants over the
    same dataset with the same warm-started frozen trunk
    (``scripts/test.bash:5``), so every run after the first starts at
    steady-state speed instead of re-paying the trunk for epoch 1."""

    def __init__(
        self, max_bytes: int = 32 << 30, disk: "DiskFeatureStore | None" = None
    ) -> None:
        self.max_bytes = max_bytes
        self.disk = disk
        self._store: dict[int, np.ndarray] = {}
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    def attach_disk(self, disk: "DiskFeatureStore") -> None:
        self.disk = disk

    def __contains__(self, window_id: int) -> bool:
        wid = int(window_id)
        return wid in self._store or (self.disk is not None and wid in self.disk)

    def get(self, window_id: int) -> np.ndarray | None:
        wid = int(window_id)
        feat = self._store.get(wid)
        if feat is None and self.disk is not None:
            feat = self.disk.get(wid)
            if feat is not None and self._bytes + feat.nbytes <= self.max_bytes:
                # promote to RAM so later epochs skip the file read
                self._store[wid] = feat
                self._bytes += feat.nbytes
        if feat is None:
            self.misses += 1
        else:
            self.hits += 1
        return feat

    def put(self, window_id: int, feat: np.ndarray, *, ram: bool = True) -> bool:
        """Store one window's features (write-through to disk when one is
        attached; ``ram=False`` writes disk only — for rows resident in
        the device pool that the cross-run tier still needs). Returns True
        iff the row is now durable in some tier."""
        wid = int(window_id)
        on_disk = self.disk.put(wid, feat) if self.disk is not None else False
        if not ram:
            return on_disk
        if wid in self._store:
            return True
        if self._bytes + feat.nbytes > self.max_bytes:
            return on_disk
        self._store[wid] = feat
        self._bytes += feat.nbytes
        return True

    @property
    def nbytes(self) -> int:
        return self._bytes

    def __len__(self) -> int:
        return len(self._store)


def gather_batch(cache: TrunkFeatureCache, window_ids, valid: int):
    """Assemble a batch's cached features, or None if any valid window is
    missing. Returns (N*F, 14, 19, 2048) matching the flattened frame
    layout of ``Trainer._prepare``."""
    feats = []
    for i, wid in enumerate(window_ids):
        if i >= valid and feats:
            feats.append(feats[-1])  # padded rows repeat (masked in eval)
            continue
        f = cache.get(int(wid))
        if f is None:
            return None
        feats.append(f)
    # host array: the caller device_puts it once with the batch sharding
    # (jnp.asarray here would commit to device 0 and force a second
    # device->device rescatter on multi-device meshes)
    return np.concatenate(feats, axis=0)


class DeviceFeatureCache:
    """HBM-resident tier in front of the host cache.

    The host-side cache removes trunk *compute* but still re-uploads every
    batch's features each step (~0.8 GB/step at 64 clips x 12 frames —
    a host->device transfer comparable to the 51 ms compute it feeds).
    This tier keeps a bounded pool of windows resident on device as one
    ``(capacity, frames, 14, 19, 2048)`` buffer; the train step receives
    the buffer plus per-window slot indices and gathers on device, so
    steady state moves no feature bytes over PCIe at all.

    The buffer is replicated over the mesh (each chip gathers its own
    batch rows locally — zero collectives under data parallelism);
    capacity is a per-chip HBM budget. Windows that do not fit stay in
    the host tier; the tiering is HBM -> host RAM -> recompute.
    """

    def __init__(self, max_bytes: int, sharding=None) -> None:
        self.max_bytes = max_bytes
        self.sharding = sharding
        self.buf = None  # (capacity, frames, 14, 19, 2048), lazy
        self.slots: dict[int, int] = {}
        self._next = 0
        self._capacity = 0
        self._insert = None

    def lookup(self, window_ids, valid: int):
        """int32 slot ids (len(window_ids),) if every valid window is
        resident, else None. Padded rows repeat the last valid slot."""
        res = self.lookup_partial(window_ids, valid)
        if res is None or res[1]:
            return None
        return res[0]

    def lookup_partial(self, window_ids, valid: int):
        """(slots, missing): slots int32 (N,) with placeholder 0 for rows
        not resident; missing = [(row_index, window_id), ...] for the
        valid rows the pool lacks. None if the pool is empty. Padded rows
        repeat the last valid slot (their loss contribution is masked)."""
        if self.buf is None:
            return None
        slots = np.zeros(len(window_ids), np.int32)
        missing: list[tuple[int, int]] = []
        last = 0
        for i, wid in enumerate(window_ids):
            if i >= valid:
                slots[i] = last
                continue
            s = self.slots.get(int(wid))
            if s is None:
                missing.append((i, int(wid)))
            else:
                slots[i] = s
                last = s
        return slots, missing

    def put_batch(self, window_ids, valid: int, feat, frames: int) -> None:
        """Insert freshly computed features (device array (N*frames, ...))
        for as many new windows as the budget allows."""
        import jax

        per_window = feat[: frames].size * feat.dtype.itemsize * 1  # bytes
        if self.buf is None:
            capacity = int(self.max_bytes // max(per_window, 1))
            if capacity <= 0:
                self._capacity = 0
                return
            self._capacity = capacity
            shape = (capacity, frames) + tuple(feat.shape[1:])
            buf = jnp.zeros(shape, feat.dtype)
            if self.sharding is not None:
                buf = jax.device_put(buf, self.sharding)
            self.buf = buf
            self._insert = jax.jit(
                lambda buf, idx, f: buf.at[idx].set(f), donate_argnums=(0,)
            )
        new_ids = [
            int(w) for i, w in enumerate(window_ids)
            if i < valid and int(w) not in self.slots
        ]
        room = self._capacity - self._next
        new_ids = new_ids[:room]
        if not new_ids:
            return
        idx, fparts = [], []
        shaped = feat.reshape(-1, frames, *feat.shape[1:])
        for i, wid in enumerate(window_ids[:valid]):
            if int(wid) in self.slots or int(wid) not in new_ids:
                continue
            self.slots[int(wid)] = self._next
            idx.append(self._next)
            fparts.append(shaped[i])
            self._next += 1
        self.buf = self._insert(
            self.buf, jnp.asarray(np.asarray(idx, np.int32)), jnp.stack(fparts)
        )

    @property
    def resident(self) -> int:
        return len(self.slots)


def _dtype_from_name(name: str) -> np.dtype:
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes  # bfloat16 etc. — not addressable by bare name

        return np.dtype(getattr(ml_dtypes, name))


class DiskFeatureStore:
    """Cross-run disk tier for frozen-trunk features.

    One directory per ``fingerprint`` (a digest of everything the feature
    values depend on: frozen backbone params + stats — or the calibrated
    int8 trunk — plus the loader's window table; see
    ``Trainer._attach_disk``), holding one raw ``w{wid}.bin`` per window
    and a ``manifest.json`` recording the uniform per-window shape/dtype.
    Writes are atomic (tmp + rename), so concurrent sweep processes over
    the same dataset can share a store: a half-written row is never
    visible, and double-writing a row is harmless (same bytes). The byte
    budget counts files already on disk, so a re-opened store keeps
    honoring the cap."""

    def __init__(self, root: str, fingerprint: str, *, max_bytes: int = 256 << 30):
        self.dir = os.path.join(root, fingerprint[:24])
        os.makedirs(self.dir, exist_ok=True)
        self.max_bytes = max_bytes
        self._manifest = os.path.join(self.dir, "manifest.json")
        self.meta: dict | None = None
        if os.path.exists(self._manifest):
            try:
                with open(self._manifest) as f:
                    self.meta = json.load(f)
            except (OSError, ValueError):
                self.meta = None
        self._index: set[int] = set()
        self._bytes = 0
        for name in os.listdir(self.dir):
            if name.startswith("w") and name.endswith(".bin"):
                try:
                    wid = int(name[1:-4])
                except ValueError:
                    continue
                self._index.add(wid)
                try:
                    self._bytes += os.path.getsize(os.path.join(self.dir, name))
                except OSError:
                    pass

    def __contains__(self, window_id: int) -> bool:
        return int(window_id) in self._index

    def __len__(self) -> int:
        return len(self._index)

    @property
    def nbytes(self) -> int:
        return self._bytes

    def _path(self, wid: int) -> str:
        return os.path.join(self.dir, f"w{wid}.bin")

    def get(self, window_id: int) -> np.ndarray | None:
        wid = int(window_id)
        if self.meta is None or wid not in self._index:
            return None
        try:
            with open(self._path(wid), "rb") as f:
                data = f.read()
        except OSError:
            self._index.discard(wid)
            return None
        arr = np.frombuffer(data, dtype=_dtype_from_name(self.meta["dtype"]))
        return arr.reshape(self.meta["shape"])

    def put(self, window_id: int, feat: np.ndarray) -> bool:
        wid = int(window_id)
        if wid in self._index:
            return True
        feat = np.ascontiguousarray(feat)
        if self.meta is None:
            self.meta = {"dtype": str(feat.dtype), "shape": list(feat.shape)}
            tmp = self._manifest + f".tmp{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(self.meta, f)
            os.replace(tmp, self._manifest)
        elif (
            list(feat.shape) != list(self.meta["shape"])
            or str(feat.dtype) != self.meta["dtype"]
        ):
            return False  # different geometry — refuse rather than corrupt
        if self._bytes + feat.nbytes > self.max_bytes:
            return False
        tmp = self._path(wid) + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(feat.tobytes())
        os.replace(tmp, self._path(wid))
        self._index.add(wid)
        self._bytes += feat.nbytes
        return True


def tree_fingerprint(*trees, digest_size: int = 20) -> str:
    """Deterministic content digest of pytrees (path order + leaf bytes):
    the identity key of a :class:`DiskFeatureStore` — two runs share
    features iff everything the features depend on hashes equal."""
    import jax

    h = hashlib.blake2b(digest_size=digest_size)
    for tree in trees:
        leaves, _ = jax.tree_util.tree_flatten_with_path(tree)
        for path, leaf in leaves:
            h.update(jax.tree_util.keystr(path).encode())
            arr = np.asarray(jax.device_get(leaf))
            h.update(str(arr.dtype).encode() + str(arr.shape).encode())
            h.update(arr.tobytes())
    return h.hexdigest()


def windows_fingerprint(loader, digest_size: int = 20) -> str:
    """Digest of a loader's window table (wid -> record paths): guards a
    disk store against a different dataset/windowing reusing window ids."""
    h = hashlib.blake2b(digest_size=digest_size)
    for window in loader.plan.windows:
        for path in window:
            h.update(path.encode() + b"\0")
        h.update(b"\1")
    return h.hexdigest()
