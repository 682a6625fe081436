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


def test_codec_fast_vs_fallback_branch_parity(rng):
    """The hand-inlined varint/str fast paths must stay byte-identical to the
    generic fallback branches (advisor r2: a future edit desyncing them would
    silently corrupt the WAL). Exercises: pk/str/array lengths straddling the
    1-byte varint boundary (0x7f/0x80), the int64/uint64 boundary, and plain
    python scalars vs their numpy equivalents (exact-type fast path vs
    isinstance fallback)."""
    # --- lengths straddling 0x80: pk, str field, field name, array len ---
    for n in (0x7E, 0x7F, 0x80, 0x81, 0x100):
        pk = "p" * n
        s = "s" * n
        name = "n" * n
        arr = np.arange(n, dtype=np.int64)
        vec = rng.standard_normal(n).astype(np.float32)
        raw = codec.encode_record(codec.OP_INSERT, pk, {name: s, "a": arr}, {"v": vec})
        op, pk2, f2, v2 = codec.decode_record(raw)
        assert (op, pk2) == (codec.OP_INSERT, pk)
        assert f2[name] == s
        np.testing.assert_array_equal(f2["a"], arr)
        np.testing.assert_array_equal(v2["v"], vec)

    # --- int64/uint64 boundary, via BOTH the exact-type fast path (plain
    # int) and the isinstance fallback (numpy scalar) ---
    i64_max = 2**63 - 1
    cases = {
        "i64_max": i64_max,          # largest value on the zigzag-varint path
        "u64_min": i64_max + 1,      # first value on the fixed-u64 path
        "u64_max": 2**64 - 1,
        "i64_min": -(2**63),
        "np_i64_max": np.int64(i64_max),
        "np_u64": np.uint64(2**64 - 1),
        "neg": -12345,
        "np_neg": np.int64(-12345),
    }
    raw = codec.encode_record(codec.OP_INSERT, "pk", cases, {})
    _, _, f2, _ = codec.decode_record(raw)
    for k, v in cases.items():
        assert f2[k] == int(v), k
        assert isinstance(f2[k], int)

    # the plain-int and numpy-int encodings of the SAME value must be
    # byte-identical (fast path vs fallback write the same frame)
    for v in (0, 1, -1, 0x7F, 0x80, i64_max, i64_max + 1, 2**64 - 1, -(2**63)):
        a = codec.encode_record(codec.OP_INSERT, "x", {"v": v}, {})
        npv = np.uint64(v) if v > i64_max else np.int64(v)
        b = codec.encode_record(codec.OP_INSERT, "x", {"v": npv}, {})
        assert a == b, f"int encoding desync at {v}"

    # --- bool vs int: bools (python + numpy) must never take the int branch ---
    raw = codec.encode_record(
        codec.OP_INSERT, "pk",
        {"bt": True, "bf": False, "nbt": np.bool_(True), "one": 1, "zero": 0}, {},
    )
    _, _, f2, _ = codec.decode_record(raw)
    assert f2["bt"] is True and f2["bf"] is False and f2["nbt"] is True
    assert f2["one"] == 1 and not isinstance(f2["one"], bool)
    assert f2["zero"] == 0 and not isinstance(f2["zero"], bool)
    a = codec.encode_record(codec.OP_INSERT, "x", {"v": True}, {})
    b = codec.encode_record(codec.OP_INSERT, "x", {"v": np.bool_(True)}, {})
    assert a == b

    # --- float: plain float (fast) vs np.float64 (fallback) ---
    a = codec.encode_record(codec.OP_INSERT, "x", {"v": 2.5}, {})
    b = codec.encode_record(codec.OP_INSERT, "x", {"v": np.float64(2.5)}, {})
    assert a == b

    # --- str: fast exact-type vs a str subclass through the fallback ---
    class S(str):
        pass

    a = codec.encode_record(codec.OP_INSERT, "x", {"v": "abc"}, {})
    b = codec.encode_record(codec.OP_INSERT, "x", {"v": S("abc")}, {})
    assert a == b


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
    schema = CollectionSchema("col_mc",
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
