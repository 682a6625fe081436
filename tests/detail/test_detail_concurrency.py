"""Sustained concurrency hammer (reference analog:
`python/tests/detail/test_collection_concurrency.py:89-344` — pure
thread-hammering assertions, no sanitizer hooks).

Threads mix insert / upsert / delete / query / fetch / optimize / flush for
thousands of ops against one collection; afterwards the collection state
must exactly match a serializable oracle of the applied writes, and every
reader must have seen only well-formed results (no exceptions, no torn
docs)."""

import threading
from collections import defaultdict

import numpy as np
import pytest

import zvec_tpu
from zvec_tpu import (
    CollectionSchema,
    DataType,
    Doc,
    FieldSchema,
    FlatIndexParam,
    MetricType,
    VectorQuery,
    VectorSchema,
)

DIM = 8


def _schema(name):
    return CollectionSchema(
        name,
        fields=[FieldSchema("val", DataType.INT64, nullable=True)],
        vectors=[
            VectorSchema("v", DataType.VECTOR_FP32, DIM, FlatIndexParam(MetricType.L2))
        ],
        max_doc_count_per_segment=2_000,  # force rotations under load
    )


def _doc(i, gen=0):
    rng = np.random.default_rng(i * 31 + gen)
    return Doc(
        id=f"d{i}",
        fields={"val": int(i * 10 + gen)},
        vectors={"v": rng.standard_normal(DIM).astype(np.float32)},
    )


def test_concurrent_insert_query_delete_hammer(tmp_path):
    """4 writer lanes + 2 reader threads + 1 maintenance thread, >=10k ops."""
    col = zvec_tpu.create_and_open(str(tmp_path / "hammer"), _schema("hammer"))
    N_PER_LANE = 1500  # 4 lanes x (insert + some upsert/delete) + reads >= 10k ops
    errors = []
    # lane-owned key spaces: writes race the collection lock, not each other,
    # so a serializable per-lane oracle exists
    lane_state = [dict() for _ in range(4)]

    def writer(lane):
        try:
            base = lane * N_PER_LANE
            for j in range(N_PER_LANE):
                i = base + j
                st = col.insert(_doc(i))
                assert st.ok(), st
                lane_state[lane][f"d{i}"] = i * 10
                if j % 7 == 3:  # upsert an earlier doc with gen=1
                    k = base + max(0, j - 3)
                    st = col.upsert(_doc(k, gen=1))
                    assert st.ok(), st
                    lane_state[lane][f"d{k}"] = k * 10 + 1
                if j % 11 == 5:  # delete an earlier doc
                    k = base + max(0, j - 5)
                    pk = f"d{k}"
                    if pk in lane_state[lane]:
                        st = col.delete(pk)
                        assert st.ok(), st
                        del lane_state[lane][pk]
        except Exception as e:  # noqa: BLE001
            errors.append(("writer", lane, repr(e)))

    stop = threading.Event()
    read_counts = [0, 0]

    def reader(slot):
        rng = np.random.default_rng(slot)
        q = rng.standard_normal(DIM).astype(np.float32)
        try:
            while not stop.is_set():
                res = col.query(VectorQuery("v", vector=q), topk=5)
                # well-formed: scores ascending (L2), ids non-empty strings
                scores = [r.score for r in res]
                assert scores == sorted(scores)
                assert all(isinstance(r.id, str) and r.id for r in res)
                got = col.fetch([f"d{rng.integers(0, 4 * N_PER_LANE)}" for _ in range(8)])
                for pk, doc in got.items():
                    # no torn docs: val field consistent with its pk
                    base_i = int(pk[1:])
                    assert doc.fields["val"] in (base_i * 10, base_i * 10 + 1), (
                        pk, doc.fields
                    )
                read_counts[slot] += 1
        except Exception as e:  # noqa: BLE001
            errors.append(("reader", slot, repr(e)))

    def maintenance():
        try:
            while not stop.is_set():
                col.optimize()
                col.flush()
        except Exception as e:  # noqa: BLE001
            errors.append(("maintenance", 0, repr(e)))

    writers = [threading.Thread(target=writer, args=(w,)) for w in range(4)]
    readers = [threading.Thread(target=reader, args=(s,)) for s in range(2)]
    maint = threading.Thread(target=maintenance)
    for t in writers + readers + [maint]:
        t.start()
    for t in writers:
        t.join(timeout=600)
    stop.set()
    for t in readers + [maint]:
        t.join(timeout=120)

    assert not errors, errors[:5]
    assert all(c > 0 for c in read_counts), "readers starved"

    # ---- serializable oracle check ----
    oracle = {}
    for st in lane_state:
        oracle.update(st)
    assert col.stats.doc_count == len(oracle)
    sample = list(oracle)[:: max(1, len(oracle) // 200)]
    got = col.fetch(sample)
    assert set(got) == set(sample)
    for pk in sample:
        assert got[pk].fields["val"] == oracle[pk], pk

    # ---- full state survives flush + reopen after the storm ----
    col.flush()
    path = col._impl.path
    del col
    col2 = zvec_tpu.open(path)
    assert col2.stats.doc_count == len(oracle)


def test_concurrent_query_during_bulk_load(tmp_path):
    """Readers during a bulk load always see a consistent prefix."""
    col = zvec_tpu.create_and_open(str(tmp_path / "bulk"), _schema("bulk"))
    total = 6_000
    errors = []
    seen_counts = []

    def loader():
        try:
            B = 500
            for lo in range(0, total, B):
                sts = col.insert([_doc(i) for i in range(lo, lo + B)])
                assert all(s.ok() for s in sts)
        except Exception as e:  # noqa: BLE001
            errors.append(repr(e))

    stop = threading.Event()

    def reader():
        rng = np.random.default_rng(0)
        q = rng.standard_normal(DIM).astype(np.float32)
        try:
            while not stop.is_set():
                n = col.stats.doc_count
                res = col.query(VectorQuery("v", vector=q), topk=10)
                # count only moves forward; hits never exceed live docs
                assert len(res) <= max(n + 500, 10)
                seen_counts.append(n)
        except Exception as e:  # noqa: BLE001
            errors.append(repr(e))

    t1 = threading.Thread(target=loader)
    t2 = threading.Thread(target=reader)
    t1.start(); t2.start()
    t1.join(timeout=600)
    stop.set()
    t2.join(timeout=60)
    assert not errors, errors[:3]
    assert col.stats.doc_count == total
    assert seen_counts == sorted(seen_counts), "doc_count went backwards"


def test_concurrent_delete_vs_query_no_ghosts(tmp_path):
    """Hits returned during concurrent deletes must materialize cleanly —
    a deleted doc may appear in-flight (snapshot semantics) but never as a
    torn/empty Doc."""
    col = zvec_tpu.create_and_open(str(tmp_path / "ghost"), _schema("ghost"))
    n = 3_000
    for lo in range(0, n, 1000):
        col.insert([_doc(i) for i in range(lo, lo + 1000)])
    col.optimize()
    errors = []

    def deleter():
        try:
            for i in range(0, n, 2):
                col.delete(f"d{i}")
        except Exception as e:  # noqa: BLE001
            errors.append(repr(e))

    stop = threading.Event()

    def querier():
        rng = np.random.default_rng(1)
        try:
            while not stop.is_set():
                q = rng.standard_normal(DIM).astype(np.float32)
                for r in col.query(VectorQuery("v", vector=q), topk=20):
                    assert r.id and r.fields["val"] is not None
        except Exception as e:  # noqa: BLE001
            errors.append(repr(e))

    td = threading.Thread(target=deleter)
    tq = threading.Thread(target=querier)
    td.start(); tq.start()
    td.join(timeout=300)
    stop.set()
    tq.join(timeout=60)
    assert not errors, errors[:3]
    assert col.stats.doc_count == n // 2
    # post-storm: no deleted doc is ever returned
    rng = np.random.default_rng(2)
    q = rng.standard_normal(DIM).astype(np.float32)
    for r in col.query(VectorQuery("v", vector=q), topk=50):
        assert int(r.id[1:]) % 2 == 1
