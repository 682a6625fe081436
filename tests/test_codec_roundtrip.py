"""Codec round-trip matrix: fast-path vs fallback-branch parity (ADVICE r2).

The hot writers in `db/codec.py` inline the varint length fast path (len <
0x80) in three places (`_write_str`, `_encode_array`, `encode_record` pk) and
duplicate the int64/uint64 boundary logic between `_encode_value`'s exact-type
fast path and its isinstance fallback. These tests pin both branches of every
duplicated encoder so a future edit can't silently desync the WAL encoding
between paths (reference WAL framing: `src/db/wal/`).
"""

import numpy as np
import pytest

from zvec_tpu.db.codec import decode_record, encode_record

I64_MAX = 0x7FFFFFFFFFFFFFFF


def roundtrip(pk="k", fields=None, vectors=None, op=1):
    raw = encode_record(op, pk, fields, vectors)
    d_op, d_pk, d_fields, d_vectors = decode_record(raw)
    assert d_op == op
    assert d_pk == pk
    return d_fields, d_vectors


# ---------------------------------------------------------------- varint 0x80
@pytest.mark.parametrize("n", [0, 1, 0x7E, 0x7F, 0x80, 0x81, 300, 20000])
def test_pk_length_straddles_varint_fast_path(n):
    pk = "p" * n
    _, _ = roundtrip(pk=pk)


@pytest.mark.parametrize("n", [0x7F, 0x80, 0x81, 5000])
def test_str_field_length_straddles_varint_fast_path(n):
    f, _ = roundtrip(fields={"s": "x" * n})
    assert f["s"] == "x" * n


@pytest.mark.parametrize("n", [0x7F, 0x80, 0x81])
def test_field_name_length_straddles_varint_fast_path(n):
    name = "n" * n
    f, _ = roundtrip(fields={name: 7})
    assert f[name] == 7


@pytest.mark.parametrize("n", [1, 0x7F, 0x80, 0x81, 1000])
def test_array_length_straddles_varint_fast_path(n):
    arr = np.arange(n, dtype=np.float32)
    _, v = roundtrip(vectors={"vec": arr})
    np.testing.assert_array_equal(np.asarray(v["vec"], dtype=np.float32), arr)


def test_multibyte_utf8_pk_length_counts_bytes_not_chars():
    # 64 chars x 3 bytes = 192 utf-8 bytes: crosses 0x80 while len(str) < 0x80
    pk = "中" * 64
    roundtrip(pk=pk)


# ------------------------------------------------------- int64/uint64 boundary
@pytest.mark.parametrize(
    "v",
    [0, 1, -1, 2**31, -(2**31), I64_MAX - 1, I64_MAX, I64_MAX + 1,
     2**64 - 1, -(2**63)],
)
def test_int_boundary_fast_path(v):
    f, _ = roundtrip(fields={"i": v})
    assert f["i"] == v
    assert type(f["i"]) is int


@pytest.mark.parametrize(
    "v, np_v",
    [
        (I64_MAX, np.int64(I64_MAX)),
        (I64_MAX, np.uint64(I64_MAX)),
        (I64_MAX + 1, np.uint64(I64_MAX + 1)),
        (2**64 - 1, np.uint64(2**64 - 1)),
        (-(2**63), np.int64(-(2**63))),
        (42, np.int32(42)),
    ],
)
def test_int_boundary_fallback_matches_fast_path(v, np_v):
    # numpy scalars route through the isinstance fallback; the encoded bytes
    # must be IDENTICAL to the exact-type fast path for the same value
    fast = encode_record(1, "k", {"i": v})
    slow = encode_record(1, "k", {"i": np_v})
    assert fast == slow
    f, _ = roundtrip(fields={"i": np_v})
    assert f["i"] == v


# ----------------------------------------------------------------- bool vs int
@pytest.mark.parametrize("b", [True, False])
def test_bool_fast_path_stays_bool(b):
    f, _ = roundtrip(fields={"b": b})
    assert f["b"] is b


@pytest.mark.parametrize("b", [True, False])
def test_np_bool_fallback_matches_bool_fast_path(b):
    fast = encode_record(1, "k", {"b": b})
    slow = encode_record(1, "k", {"b": np.bool_(b)})
    assert fast == slow
    f, _ = roundtrip(fields={"b": np.bool_(b)})
    assert f["b"] is b


def test_bool_true_and_int_one_encode_differently():
    # bool must be dispatched BEFORE int (True == 1 but carries _T_BOOL)
    assert encode_record(1, "k", {"x": True}) != encode_record(1, "k", {"x": 1})


# ----------------------------------------------------- float fast vs fallback
def test_float_fallback_matches_fast_path():
    for v in (0.0, -1.5, 3.14159, float("inf")):
        fast = encode_record(1, "k", {"f": v})
        slow = encode_record(1, "k", {"f": np.float64(v)})
        assert fast == slow
        f, _ = roundtrip(fields={"f": np.float64(v)})
        assert f["f"] == v and type(f["f"]) is float


def test_float_nan_roundtrip():
    f, _ = roundtrip(fields={"f": float("nan")})
    assert np.isnan(f["f"])


# ------------------------------------------------------------ mixed-shape recs
def test_full_record_mixed_branches():
    fields = {
        "s" * 0x80: "v" * 0x80,      # both name and value on the varint slow path
        "i": I64_MAX + 7,            # uint64 branch
        "j": -5,                     # zigzag int64 branch
        "b": False,
        "z": None,
        "raw": b"\x00\x01\xff" * 50,
        "tags": ["a", "b" * 200],    # str-array with a slow-path element
    }
    vectors = {
        "dense": np.arange(0x80, dtype=np.float32),   # array slow-path length
        "sparse": {3: 0.5, 1: -2.0},
    }
    f, v = roundtrip(pk="p" * 0x7F, fields=fields, vectors=vectors)
    assert f["i"] == I64_MAX + 7
    assert f["j"] == -5
    assert f["b"] is False
    assert f["z"] is None
    assert f["raw"] == fields["raw"]
    assert list(f["tags"]) == fields["tags"]
    np.testing.assert_array_equal(
        np.asarray(v["dense"], np.float32), vectors["dense"]
    )
    assert {int(k): float(x) for k, x in v["sparse"].items()} == {1: -2.0, 3: 0.5}


def test_arrow_writer_chunked_rows(tmp_path, monkeypatch):
    """The IPC writer must chunk rows (int32 child-length cap: a 10M x 768
    fp32 column overflows a single record batch). Force a 3-row cap and
    verify the file carries multiple batches and round-trips exactly."""
    import numpy as np
    import pyarrow as pa
    from pyarrow import ipc

    from zvec_tpu.db.forward_store import write_arrow

    monkeypatch.setenv("ZVEC_ARROW_CHUNK_ROWS", "3")
    flat = pa.array(np.arange(10 * 4, dtype=np.float32))
    col = pa.FixedSizeListArray.from_arrays(flat, 4)
    table = pa.table({"pk": pa.array([str(i) for i in range(10)]), "v": col})
    path = str(tmp_path / "f.arrow")
    write_arrow(table, path, file_format="arrow")
    with pa.memory_map(path) as src:
        rf = ipc.open_file(src)
        assert rf.num_record_batches >= 4, rf.num_record_batches
        got = rf.read_all()
    back = np.asarray(
        got.column("v").combine_chunks().flatten().to_numpy(zero_copy_only=False)
    ).reshape(10, 4)
    np.testing.assert_array_equal(back, np.arange(40, dtype=np.float32).reshape(10, 4))
