"""Inverted scalar index + planner heuristic tests (reference analog:
`tests/db/` inverted index suites, `invert_recall_test.cc`, optimizer rules)."""

import numpy as np
import pytest

import zvec_tpu
from zvec_tpu import (
    CollectionSchema,
    DataType,
    Doc,
    FieldSchema,
    FlatIndexParam,
    InvertIndexParam,
    MetricType,
    VectorQuery,
    VectorSchema,
)
from zvec_tpu.db.inverted import InvertedColumnIndex


def build_numeric(values, nulls=None):
    values = np.asarray(values, dtype=object)
    nulls = (
        np.asarray(nulls, dtype=bool)
        if nulls is not None
        else np.zeros(len(values), dtype=bool)
    )
    return InvertedColumnIndex.build(values, nulls, DataType.INT64, True, False)


def test_numeric_ops():
    idx = build_numeric([5, 3, 8, 3, 1, 9, 3])
    assert idx.query("=", 3).tolist() == [1, 3, 6]
    assert idx.query("<", 4).tolist() == [1, 3, 4, 6]
    assert idx.query(">=", 8).tolist() == [2, 5]
    assert idx.query("!=", 3).tolist() == [0, 2, 4, 5]
    assert idx.query("IN", [1, 9]).tolist() == [4, 5]
    assert idx.query("NOT_IN", [3, 5]).tolist() == [2, 4, 5]


def test_numeric_nulls_never_match():
    idx = build_numeric([5, None, 8], nulls=[False, True, False])
    assert idx.query("!=", 5).tolist() == [2]  # null row excluded
    assert idx.query("<", 100).tolist() == [0, 2]


def test_string_ops():
    vals = np.asarray(["apple", "banana", "apricot", "cherry", "banana"], dtype=object)
    idx = InvertedColumnIndex.build(
        vals, np.zeros(5, bool), DataType.STRING, False, True
    )
    assert idx.query("=", "banana").tolist() == [1, 4]
    assert sorted(idx.query("LIKE", "ap%").tolist()) == [0, 2]
    assert sorted(idx.query("LIKE", "%ana").tolist()) == [1, 4]  # suffix via reversed terms
    assert sorted(idx.query("LIKE", "%err%").tolist()) == [3]
    assert idx.evaluate_ratio("=", "banana") == pytest.approx(0.4)


def test_array_contain():
    vals = np.asarray(
        [["a", "b"], ["b", "c"], None, ["a", "c", "d"]], dtype=object
    )
    idx = InvertedColumnIndex.build(
        vals, np.asarray([False, False, True, False]), DataType.ARRAY_STRING, False, False
    )
    assert idx.query("CONTAIN_ANY", ["a"]).tolist() == [0, 3]
    assert idx.query("CONTAIN_ALL", ["a", "c"]).tolist() == [3]
    assert idx.query("NOT_CONTAIN_ANY", ["b"]).tolist() == [3]


def test_save_load(tmp_path):
    idx = build_numeric([5, 3, 8])
    p = str(tmp_path / "inv.npz")
    idx.save(p)
    idx2 = InvertedColumnIndex.load(p)
    assert idx2.query("<", 6).tolist() == idx.query("<", 6).tolist()


def test_inverted_used_in_collection(tmp_path, rng):
    """Sealed segments answer filters through the inverted index; results must
    stay identical to forward-scan semantics."""
    schema = CollectionSchema(
        "inv",
        fields=[
            FieldSchema(
                "price",
                DataType.INT64,
                index_param=InvertIndexParam(enable_range_optimization=True),
            ),
            FieldSchema("cat", DataType.STRING, index_param=InvertIndexParam()),
        ],
        vectors=[
            VectorSchema("e", DataType.VECTOR_FP32, 8, FlatIndexParam(MetricType.L2))
        ],
        max_doc_count_per_segment=500,
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "inv"), schema)
    xs = rng.standard_normal((600, 8)).astype(np.float32)
    c.insert(
        [
            Doc(
                id=f"p{i}",
                vectors={"e": xs[i]},
                fields={"price": i, "cat": f"c{i % 5}"},
            )
            for i in range(600)
        ]
    )
    # sealed segment has inverted indexes persisted
    seg = c._impl.segments[0]
    assert seg.inverted_index("price") is not None
    assert seg.inverted_index("cat") is not None

    res = c.query(
        VectorQuery("e", vector=xs[100]), topk=5, filter="price >= 90 AND price < 110"
    )
    assert res[0].id == "p100"
    assert all(90 <= int(r.id[1:]) < 110 for r in res)

    # ultra-selective filter triggers brute-force-by-keys; still exact
    res = c.query(VectorQuery("e", vector=xs[0]), topk=3, filter="price IN (7, 8, 9)")
    assert sorted(r.id for r in res) == ["p7", "p8", "p9"]

    # survives reopen
    c.flush()
    c._impl.close()
    c2 = zvec_tpu.open(str(tmp_path / "inv"))
    res = c2.query(VectorQuery("e", vector=xs[42]), topk=2, filter="cat = 'c2'")
    assert all(int(r.id[1:]) % 5 == 2 for r in res)
    c2._impl.close()


def test_has_prefix_suffix_ops():
    vals = np.asarray(["apple", "banana", "apricot", "cherry", "banana"], dtype=object)
    idx = InvertedColumnIndex.build(
        vals, np.zeros(5, bool), DataType.STRING, False, True
    )
    assert sorted(idx.query("HAS_PREFIX", "ap").tolist()) == [0, 2]
    assert sorted(idx.query("HAS_SUFFIX", "ana").tolist()) == [1, 4]
    assert idx.supports("HAS_PREFIX") and idx.supports("HAS_SUFFIX")
    # without extended wildcard, suffix falls back to a term scan
    idx2 = InvertedColumnIndex.build(
        vals, np.zeros(5, bool), DataType.STRING, False, False
    )
    assert sorted(idx2.query("HAS_SUFFIX", "ana").tolist()) == [1, 4]
