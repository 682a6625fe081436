"""Write-ahead log.

Per-segment durability point, as in the reference (`src/db/index/storage/wal/
wal_file.h:32-65`, `local_wal_file.cc`): every write op is appended + fsync'd
before being applied, replayed on open, and the file is removed after a
successful flush (`segment.cc:2160-2168`).

File layout: 8-byte magic header, then records:
  [u32 payload_len][u32 crc32(payload)][payload bytes]
A torn tail (partial record or CRC mismatch) truncates replay at the last
good record, matching crash-recovery semantics.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Iterator, List

__all__ = ["WalFile"]

_MAGIC = b"ZVWAL\x01\x00\x00"
_HEADER = struct.Struct("<II")


class WalFile:
    def __init__(self, path: str, sync: bool = True):
        self.path = path
        self.sync = sync
        self._fh = None

    # ---- write side ----
    def open_for_append(self) -> None:
        exists = os.path.exists(self.path) and os.path.getsize(self.path) > 0
        self._fh = open(self.path, "ab")
        if not exists:
            self._fh.write(_MAGIC)
            self._flush()

    def append(self, payload: bytes) -> None:
        if self._fh is None:
            self.open_for_append()
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        self._fh.write(_HEADER.pack(len(payload), crc))
        self._fh.write(payload)

    def append_batch(self, payloads: List[bytes]) -> None:
        """Append a write batch and make it durable with a single fsync."""
        for p in payloads:
            self.append(p)
        self._flush()

    def _flush(self) -> None:
        self._fh.flush()
        if self.sync:
            os.fsync(self._fh.fileno())

    def flush(self) -> None:
        if self._fh is not None:
            self._flush()

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def remove(self) -> None:
        self.close()
        if os.path.exists(self.path):
            os.remove(self.path)

    # ---- read side ----
    def replay(self) -> Iterator[bytes]:
        """Yield every intact record; stop silently at a torn tail."""
        if not os.path.exists(self.path):
            return
        with open(self.path, "rb") as fh:
            magic = fh.read(len(_MAGIC))
            if magic != _MAGIC:
                return
            while True:
                header = fh.read(_HEADER.size)
                if len(header) < _HEADER.size:
                    return
                length, crc = _HEADER.unpack(header)
                payload = fh.read(length)
                if len(payload) < length:
                    return  # torn write
                if (zlib.crc32(payload) & 0xFFFFFFFF) != crc:
                    return  # corrupt tail
                yield payload
