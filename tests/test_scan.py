"""Bulk scan/export API: stream the collection out as Arrow RecordBatches
(reference `Segment::scan` -> RecordBatchReader, `segment.cc:2627`;
columnar `fetch(columns, indices)`, `base_forward_store.h:39-57`)."""

import numpy as np
import pyarrow as pa
import pytest

import zvec_tpu
from zvec_tpu import (
    CollectionSchema,
    DataType,
    Doc,
    FieldSchema,
    FlatIndexParam,
    MetricType,
    VectorSchema,
)


def _build(tmp_path, rng, n=100_000, d=8, seg_cap=40_000):
    schema = CollectionSchema(
        "scan_col",
        fields=[
            FieldSchema("price", DataType.FLOAT),
            FieldSchema("tag", DataType.STRING),
        ],
        vectors=[VectorSchema("vec", DataType.VECTOR_FP32, d, FlatIndexParam(MetricType.L2))],
        max_doc_count_per_segment=seg_cap,  # force several sealed segments
    )
    col = zvec_tpu.create_and_open(str(tmp_path / "c"), schema)
    X = rng.standard_normal((n, d)).astype(np.float32)
    prices = (rng.random(n) * 100).astype(np.float32)
    tags = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    B = 1024
    for lo in range(0, n, B):
        col.insert(
            [
                Doc(
                    id=str(i),
                    fields={"price": float(prices[i]), "tag": str(tags[i])},
                    vectors={"vec": X[i]},
                )
                for i in range(lo, min(lo + B, n))
            ]
        )
    return col, X, prices, tags


def test_scan_filtered_matches_doc_oracle(tmp_path, rng):
    n = 100_000
    col, X, prices, tags = _build(tmp_path, rng, n=n)
    # deletes must disappear from the export
    deleted = [str(i) for i in range(0, n, 9973)]
    col.delete(deleted)

    tbl = pa.Table.from_batches(
        col.scan(["price", "tag", "vec"], filter="price > 75 AND tag = 'b'")
    )
    assert tbl.column_names == ["id", "price", "tag", "vec"]

    # doc-level oracle
    del_set = {int(i) for i in deleted}
    expect = {
        i
        for i in range(n)
        if i not in del_set and prices[i] > 75 and tags[i] == "b"
    }
    got_ids = [int(v) for v in tbl.column("id").to_pylist()]
    assert set(got_ids) == expect
    assert tbl.num_rows == len(expect)

    # values must match the inserted docs exactly
    got_price = np.asarray(tbl.column("price").to_numpy(zero_copy_only=False))
    got_vec = np.asarray(tbl.column("vec").combine_chunks().flatten()).reshape(
        tbl.num_rows, -1
    )
    for row in range(0, tbl.num_rows, max(1, tbl.num_rows // 50)):
        i = got_ids[row]
        assert got_price[row] == pytest.approx(prices[i])
        np.testing.assert_array_equal(got_vec[row], X[i])


def test_scan_full_and_batching(tmp_path, rng):
    n = 5_000
    col, X, prices, tags = _build(tmp_path, rng, n=n, seg_cap=2_000)
    batches = list(col.scan(batch_size=700))
    assert all(b.num_rows <= 700 for b in batches)
    tbl = pa.Table.from_batches(batches)
    assert tbl.num_rows == n
    # full width: pk + scalars + vectors
    assert set(tbl.column_names) == {"id", "price", "tag", "vec"}
    # every row present exactly once
    assert sorted(int(v) for v in tbl.column("id").to_pylist()) == list(range(n))

    # scan survives flush + reopen (sealed mmap path)
    col.flush()
    path = col._impl.path
    del col
    col2 = zvec_tpu.open(path)
    tbl2 = pa.Table.from_batches(col2.scan())
    assert tbl2.num_rows == n


def test_scan_column_validation_and_empty(tmp_path, rng):
    col, *_ = _build(tmp_path, rng, n=1_000, seg_cap=10_000)
    with pytest.raises(zvec_tpu.ZvecError):
        list(col.scan(["nope"]))
    with pytest.raises(zvec_tpu.ZvecError):
        list(col.scan(batch_size=0))
    # unsatisfiable filter -> no batches
    assert list(col.scan(filter="price > 1000")) == []
    # projection keeps only what was asked (+ id)
    b = next(iter(col.scan(["tag"])))
    assert b.schema.names == ["id", "tag"]
