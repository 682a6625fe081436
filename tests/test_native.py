"""Native host library tests (WAL framing + CRC32C), both code paths."""

import os

import pytest

import zvec_tpu.utils.native as nat
from zvec_tpu.db.wal import WalFile


def test_crc32c_known_answer():
    # RFC 3720 known-answer vector
    assert nat.crc32c(b"123456789") == 0xE3069283
    assert nat.crc32c(b"") == 0


def test_native_and_fallback_agree(rng):
    data = rng.integers(0, 256, 1000, dtype="uint8").tobytes()
    native_val = nat.crc32c(data)
    saved_lib, saved_tried = nat._lib, nat._tried
    try:
        nat._lib, nat._tried = None, True
        assert nat.crc32c(data) == native_val
    finally:
        nat._lib, nat._tried = saved_lib, saved_tried


def test_wal_roundtrip(tmp_path):
    path = str(tmp_path / "w.log")
    w = WalFile(path)
    records = [b"alpha", b"beta" * 100, b"", b"gamma"]
    w.append_batch(records)
    w.close()
    assert list(WalFile(path).replay()) == records


def test_wal_torn_tail(tmp_path):
    path = str(tmp_path / "w.log")
    w = WalFile(path)
    w.append_batch([b"good1", b"good2"])
    w.close()
    # corrupt: truncate mid-record
    size = os.path.getsize(path)
    with open(path, "r+b") as fh:
        fh.truncate(size - 3)
    assert list(WalFile(path).replay()) == [b"good1"]


def test_wal_corrupt_crc(tmp_path):
    path = str(tmp_path / "w.log")
    w = WalFile(path)
    w.append_batch([b"good1", b"good2"])
    w.close()
    with open(path, "r+b") as fh:
        fh.seek(os.path.getsize(path) - 1)
        fh.write(b"\xff")
    assert list(WalFile(path).replay()) == [b"good1"]


def test_wal_scan_fallback_agrees(tmp_path):
    path = str(tmp_path / "w.log")
    w = WalFile(path)
    w.append_batch([b"r1", b"r22", b"r333"])
    w.close()
    with open(path, "rb") as fh:
        blob = fh.read()[8:]
    native_pairs = nat.wal_scan(blob)
    saved_lib, saved_tried = nat._lib, nat._tried
    try:
        nat._lib, nat._tried = None, True
        assert nat.wal_scan(blob) == native_pairs
    finally:
        nat._lib, nat._tried = saved_lib, saved_tried
    assert len(native_pairs) == 3
