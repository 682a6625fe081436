"""WAL robustness: truncation at every byte offset never corrupts recovery,
and the codec roundtrips arbitrary docs (reference analog: `wal_file_test.cc`)."""

import os

import numpy as np
import pytest

from zvec_tpu.db import codec
from zvec_tpu.db.wal import WalFile


def test_truncation_at_every_offset(tmp_path, rng):
    path = str(tmp_path / "w.log")
    w = WalFile(path)
    records = [bytes([i]) * (i + 1) for i in range(12)]
    w.append_batch(records)
    w.close()
    full = os.path.getsize(path)

    for cut in range(full + 1):
        p2 = str(tmp_path / "cut.log")
        with open(path, "rb") as src, open(p2, "wb") as dst:
            dst.write(src.read()[:cut])
        got = list(WalFile(p2).replay())
        # recovered records must be an exact prefix of what was written
        assert got == records[: len(got)]
        os.remove(p2)


def test_random_corruption_never_yields_garbage(tmp_path, rng):
    path = str(tmp_path / "w.log")
    w = WalFile(path)
    records = [rng.integers(0, 256, rng.integers(1, 200), dtype="uint8").tobytes()
               for _ in range(20)]
    w.append_batch(records)
    w.close()
    data = bytearray(open(path, "rb").read())
    for _ in range(50):
        corrupted = bytearray(data)
        pos = int(rng.integers(8, len(data)))
        corrupted[pos] ^= 0xFF
        p2 = str(tmp_path / "c.log")
        open(p2, "wb").write(bytes(corrupted))
        got = list(WalFile(p2).replay())
        # every recovered record must be one of the originals, in order,
        # EXCEPT possibly one whose payload byte was flipped yet still...
        # no: CRC catches single-byte flips, so recovery is a clean prefix
        # unless the flip hit a length field making a frame mis-parse AND the
        # CRC of the misread bytes collides (astronomically unlikely).
        assert got == records[: len(got)]


def test_codec_roundtrip_exhaustive(rng):
    fields = {
        "s": "héllo \"quoted\" \\ text",
        "i": -(2**62),
        "u": 2**63 + 5,
        "f": 3.14159,
        "b": True,
        "none": None,
        "arr_i": np.asarray([1, -2, 3], dtype=np.int64),
        "arr_f": np.asarray([0.5, -0.25], dtype=np.float32),
        "arr_s": ["a", "b", ""],
        "bytes": b"\x00\xff\x01",
    }
    vectors = {
        "dense": rng.standard_normal(16).astype(np.float32),
        "half": rng.standard_normal(8).astype(np.float16),
        "int8": rng.integers(-100, 100, 4).astype(np.int8),
        "sparse": {3: 0.5, 100000: -1.25},
    }
    raw = codec.encode_record(codec.OP_UPSERT, "pk-1", fields, vectors)
    op, pk, f2, v2 = codec.decode_record(raw)
    assert (op, pk) == (codec.OP_UPSERT, "pk-1")
    assert f2["s"] == fields["s"]
    assert f2["i"] == fields["i"]
    assert f2["u"] == fields["u"]
    assert f2["f"] == pytest.approx(fields["f"])
    assert f2["b"] is True
    assert f2["none"] is None
    np.testing.assert_array_equal(f2["arr_i"], fields["arr_i"])
    np.testing.assert_array_equal(f2["arr_f"], fields["arr_f"])
    assert f2["arr_s"] == fields["arr_s"]
    assert f2["bytes"] == fields["bytes"]
    np.testing.assert_array_equal(v2["dense"], vectors["dense"])
    np.testing.assert_array_equal(v2["half"], vectors["half"])
    np.testing.assert_array_equal(v2["int8"], vectors["int8"])
    assert v2["sparse"] == {3: pytest.approx(0.5), 100000: pytest.approx(-1.25)}


def test_executor_concurrency_env(tmp_path, rng, monkeypatch):
    """Multi-vector queries run thread-parallel under ZVEC_QUERY_CONCURRENCY."""
    import zvec_tpu
    from zvec_tpu import (
        CollectionSchema,
        DataType,
        Doc,
        FlatIndexParam,
        MetricType,
        RrfReRanker,
        VectorQuery,
        VectorSchema,
    )

    monkeypatch.setenv("ZVEC_QUERY_CONCURRENCY", "4")
    schema = CollectionSchema(
        "mc",
        vectors=[
            VectorSchema("a", DataType.VECTOR_FP32, 8, FlatIndexParam(MetricType.L2)),
            VectorSchema("b", DataType.VECTOR_FP32, 8, FlatIndexParam(MetricType.IP)),
        ],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "mc"), schema)
    xs = rng.standard_normal((50, 8)).astype(np.float32)
    ys = rng.standard_normal((50, 8)).astype(np.float32)
    c.insert([Doc(id=f"m{i}", vectors={"a": xs[i], "b": ys[i]}) for i in range(50)])
    res = c.query(
        [VectorQuery("a", vector=xs[7]), VectorQuery("b", vector=ys[7])],
        topk=10,
        reranker=RrfReRanker(topn=5),
    )
    assert res[0].id == "m7"
    c._impl.close()
