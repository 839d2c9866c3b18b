"""ctypes bindings for the C++ ingest library (``cpp/ingest.cc``).

Builds ``libaig_ingest.so`` on first use (g++ -O3, cached next to the
source) and decodes GZIP TFRecord shards straight into preallocated NumPy
arrays — the native counterpart of ``data/tfrecord.py`` + ``data/proto.py``
+ ``data/schema.py`` for the host hot path (SURVEY.md §2.6: the one
genuinely native piece of the reference stack was TF's C++ tf.data
runtime). Falls back silently if no compiler is available; callers check
``available()``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "cpp", "ingest.cc")
_LIB = os.path.join(_REPO_ROOT, "cpp", "libaig_ingest.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_failed = False

FRAMES_PER_SECOND = 12
ACOUSTIC_H, ACOUSTIC_W = 36, 48
NUM_SAMPLES = 1024
VIDEO_H, VIDEO_W = 224, 298


def _build() -> bool:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return True
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB, "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_SRC) or not _build():
            _build_failed = True
            return None
        lib = ctypes.CDLL(_LIB)
        lib.aig_decode_file_v.restype = ctypes.c_int
        lib.aig_decode_file_v.argtypes = [
            ctypes.c_char_p,
            ctypes.c_void_p, ctypes.c_int64,  # acoustic
            ctypes.c_void_p, ctypes.c_int64,  # audio
            ctypes.c_void_p, ctypes.c_int64,  # video
            ctypes.POINTER(ctypes.c_int32),  # action
            ctypes.POINTER(ctypes.c_int32),  # location
            ctypes.POINTER(ctypes.c_int32),  # frames
            ctypes.c_int,  # verify_crc
        ]
        lib.aig_last_error.restype = ctypes.c_char_p
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_file_into(
    path: str,
    acoustic: np.ndarray | None,  # (F, 36, 48, C) float32, C-contiguous
    audio: np.ndarray | None,  # (F, 1024) int32
    video: np.ndarray | None,  # (F, 224, 298, 3) uint8
    *,
    verify_crc: bool | None = None,
) -> tuple[int, int, int]:
    """Decode one shard into the given frame slabs. Returns
    (action, location, frames_decoded). Raises on decode errors.

    ``verify_crc`` checks the TFRecord masked CRC32-C framing checksums
    (length + payload) — worth enabling for uncompressed re-shards, which
    lack gzip's stream CRC; defaults to the ``AIG_VERIFY_CRC`` env var."""
    lib = _load()
    assert lib is not None, "native ingest unavailable"
    act = ctypes.c_int32(-1)
    loc = ctypes.c_int32(-1)
    frames = ctypes.c_int32(0)

    def buf(a):
        if a is None:
            return None, 0
        assert a.flags["C_CONTIGUOUS"]
        return a.ctypes.data_as(ctypes.c_void_p), a.nbytes

    ac_p, ac_n = buf(acoustic)
    au_p, au_n = buf(audio)
    vi_p, vi_n = buf(video)
    if verify_crc is None:
        verify_crc = os.environ.get("AIG_VERIFY_CRC", "0") == "1"
    rc = lib.aig_decode_file_v(
        path.encode(), ac_p, ac_n, au_p, au_n, vi_p, vi_n,
        ctypes.byref(act), ctypes.byref(loc), ctypes.byref(frames),
        1 if verify_crc else 0,
    )
    if rc != 0:
        raise IOError(f"native decode failed for {path}: "
                      f"{lib.aig_last_error().decode()}")
    return int(act.value), int(loc.value), int(frames.value)
