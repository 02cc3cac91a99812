"""Minimal TensorBoard event writer (no tensorflow/tensorboardX dependency).

Writes scalar summaries in the standard `events.out.tfevents.*` format —
TFRecord framing with masked CRC32C plus hand-encoded Event/Summary protos —
so runs are viewable in stock TensorBoard, matching the reference's
TensorBoardLogger layout `<save_dir>/<name>/<version>/<sub_dir>`
(reference config/shared_types.py:145-177).
"""

from __future__ import annotations

import os
import socket
import struct
import time
from pathlib import Path

import numpy as np

# ---------------------------------------------------------------------------
# CRC32C (Castagnoli), table-driven


def _make_crc32c_table() -> np.ndarray:
    poly = 0x82F63B78
    table = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ (poly if crc & 1 else 0)
        table[i] = crc
    return table


_CRC_TABLE = _make_crc32c_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    arr = np.frombuffer(data, dtype=np.uint8)
    for byte in arr:
        crc = (_CRC_TABLE[(crc ^ int(byte)) & 0xFF] ^ (crc >> 8)) & 0xFFFFFFFF
    return crc ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    crc = int(crc32c(data)) & 0xFFFFFFFF
    return ((((crc >> 15) | (crc << 17)) & 0xFFFFFFFF) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Tiny protobuf wire-format encoder (only what Event/Summary need)


def _varint(value: int) -> bytes:
    out = b""
    value &= 0xFFFFFFFFFFFFFFFF
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out += bytes([bits | 0x80])
        else:
            out += bytes([bits])
            return out


def _key(field: int, wire_type: int) -> bytes:
    return _varint((field << 3) | wire_type)


def _double_field(field: int, value: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", value)


def _float_field(field: int, value: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", value)


def _int64_field(field: int, value: int) -> bytes:
    return _key(field, 0) + _varint(value)


def _bytes_field(field: int, value: bytes) -> bytes:
    return _key(field, 2) + _varint(len(value)) + value


def _string_field(field: int, value: str) -> bytes:
    return _bytes_field(field, value.encode("utf8"))


def encode_scalar_event(tag: str, value: float, step: int, wall_time: float) -> bytes:
    # Summary.Value { tag=1, simple_value=2 }
    summary_value = _string_field(1, tag) + _float_field(2, float(value))
    # Summary { value=1 repeated }
    summary = _bytes_field(1, summary_value)
    # Event { wall_time=1, step=2, summary=5 }
    return (
        _double_field(1, wall_time)
        + _int64_field(2, int(step))
        + _bytes_field(5, summary)
    )


def encode_file_version_event(wall_time: float) -> bytes:
    # Event { wall_time=1, file_version=3 }
    return _double_field(1, wall_time) + _string_field(3, "brain.Event:2")


class SummaryWriter:
    """Append-only scalar event writer compatible with TensorBoard."""

    def __init__(self, log_dir: Path | str):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        filename = (
            f"events.out.tfevents.{int(time.time())}."
            f"{socket.gethostname()}.{os.getpid()}.0"
        )
        self.path = self.log_dir / filename
        self._file = open(self.path, "ab")
        self._write_record(encode_file_version_event(time.time()))

    def _write_record(self, data: bytes) -> None:
        header = struct.pack("<Q", len(data))
        self._file.write(header)
        self._file.write(struct.pack("<I", masked_crc(header)))
        self._file.write(data)
        self._file.write(struct.pack("<I", masked_crc(data)))

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._write_record(
            encode_scalar_event(tag, value, step, time.time())
        )

    def add_scalars(self, metrics: dict, step: int) -> None:
        for tag, value in metrics.items():
            if np.isscalar(value) or hasattr(value, "item"):
                self.add_scalar(tag, float(value), step)

    def flush(self) -> None:
        self._file.flush()

    def close(self) -> None:
        self._file.close()
