"""TFRecord container I/O without TensorFlow.

The reference stores every dataset as GZIP-compressed TFRecord files of
``tf.train.SequenceExample`` protos (``/root/reference/convert_data.py:
247-279``) and reads them with ``tf.data.TFRecordDataset(compression_type=
'GZIP')`` (``/root/reference/dataloader/outdoor_data_mfcc.py:62``). This
module implements the container format from the public spec:

    record := uint64 length | uint32 masked_crc32c(length)
            | bytes data    | uint32 masked_crc32c(data)

with CRC32-C (Castagnoli) and TensorFlow's CRC masking. GZIP files are
whole-stream compressed. A C++ fast path (``cpp/ingest``) implements the
same format for the production pipeline; this pure-Python version is the
reference implementation and test fallback.
"""

from __future__ import annotations

import gzip
import struct
from typing import Iterator

# --- CRC32-C (Castagnoli, polynomial 0x1EDC6F41, reflected 0x82F63B78) ---

_CRC_TABLE: list[int] | None = None


def _crc_table() -> list[int]:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = 0x82F63B78
        table = []
        for i in range(256):
            crc = i
            for _ in range(8):
                crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
            table.append(crc)
        _CRC_TABLE = table
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    table = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


_MASK_DELTA = 0xA282EAD8


def masked_crc32c(data: bytes) -> int:
    crc = crc32c(data)
    return ((crc >> 15) | (crc << 17)) + _MASK_DELTA & 0xFFFFFFFF


def write_record(stream, data: bytes) -> None:
    length = struct.pack("<Q", len(data))
    stream.write(length)
    stream.write(struct.pack("<I", masked_crc32c(length)))
    stream.write(data)
    stream.write(struct.pack("<I", masked_crc32c(data)))


def iter_records(stream, *, verify_crc: bool = False) -> Iterator[bytes]:
    while True:
        header = stream.read(12)
        if not header:
            return
        if len(header) < 12:
            raise IOError("truncated TFRecord header")
        (length,) = struct.unpack("<Q", header[:8])
        if verify_crc:
            (crc,) = struct.unpack("<I", header[8:12])
            if masked_crc32c(header[:8]) != crc:
                raise IOError("corrupt TFRecord length crc")
        data = stream.read(length)
        if len(data) < length:
            raise IOError("truncated TFRecord payload")
        footer = stream.read(4)
        if verify_crc:
            (crc,) = struct.unpack("<I", footer)
            if masked_crc32c(data) != crc:
                raise IOError("corrupt TFRecord data crc")
        yield data


def detect_compression(path: str) -> str | None:
    """'GZIP' if the file starts with the gzip magic, else None. Lets one
    list file mix gzip shards (reference converters) with uncompressed
    re-shards (high-throughput ingest)."""
    with open(path, "rb") as f:
        magic = f.read(2)
    return "GZIP" if magic == b"\x1f\x8b" else None


def read_records(path: str, *, compression: str | None = "auto",
                 verify_crc: bool = False) -> list[bytes]:
    if compression == "auto":
        compression = detect_compression(path)
    opener = gzip.open if compression == "GZIP" else open
    with opener(path, "rb") as f:
        return list(iter_records(f, verify_crc=verify_crc))


def write_records(path: str, records: list[bytes],
                  *, compression: str | None = "GZIP") -> None:
    opener = gzip.open if compression == "GZIP" else open
    with opener(path, "wb") as f:
        for rec in records:
            write_record(f, rec)
