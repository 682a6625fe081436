"""Query-during-optimize stress (reference analog:
`python/tests/detail/test_collection_concurrency.py:89-344`).

optimize() runs its heavy merge outside the collection lock; readers must
keep serving consistent results from the old segment list until the version
swap, and writes that land during the merge must survive reconciliation.
"""

import threading
import time

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


@pytest.fixture
def schema():
    return CollectionSchema(
        "opt",
        fields=[FieldSchema("price", DataType.DOUBLE, nullable=True)],
        vectors=[
            VectorSchema("emb", DataType.VECTOR_FP32, 16, FlatIndexParam(MetricType.L2))
        ],
        max_doc_count_per_segment=300,
    )


def test_query_during_optimize(tmp_path, schema, rng):
    c = zvec_tpu.create_and_open(str(tmp_path / "c"), schema)
    n = 700  # several sealed segments + a writing one
    X = rng.standard_normal((n, 16)).astype(np.float32)
    for lo in range(0, n, 100):
        c.insert(
            [
                Doc(id=f"d{i}", vectors={"emb": X[i]}, fields={"price": float(i)})
                for i in range(lo, min(lo + 100, n))
            ]
        )
    c.delete([f"d{i}" for i in range(0, 50)])

    errors = []
    stop = threading.Event()
    query_counts = [0]

    def reader():
        try:
            while not stop.is_set():
                qi = int(np.random.default_rng(query_counts[0]).integers(50, n))
                res = c.query(VectorQuery("emb", vector=X[qi]), topk=3)
                if not res or res[0].id != f"d{qi}":
                    errors.append(f"bad top1 for d{qi}: {[r.id for r in res]}")
                    return
                ids = {r.id for r in res}
                if any(int(i[1:]) < 50 for i in ids):
                    errors.append(f"deleted doc surfaced: {ids}")
                    return
                query_counts[0] += 1
        except Exception as e:  # noqa: BLE001
            errors.append(repr(e))

    def writer():
        try:
            i = n
            while not stop.is_set():
                v = np.random.default_rng(i).standard_normal(16).astype(np.float32)
                c.insert(Doc(id=f"w{i}", vectors={"emb": v}, fields={"price": 1.0}))
                i += 1
                time.sleep(0.002)
        except Exception as e:  # noqa: BLE001
            errors.append(repr(e))

    threads = [threading.Thread(target=reader) for _ in range(2)] + [
        threading.Thread(target=writer)
    ]
    for t in threads:
        t.start()
    time.sleep(0.1)
    c.optimize()
    time.sleep(0.3)  # keep hammering after the swap
    stop.set()
    for t in threads:
        t.join()
    assert not errors, errors[:3]
    assert query_counts[0] > 0, "readers never ran"

    # post-conditions: one compacted segment, deletes dropped, data intact
    assert len(c._impl.segments) == 1
    res = c.query(VectorQuery("emb", vector=X[60]), topk=1)
    assert res[0].id == "d60"
    assert c.query(VectorQuery("emb", vector=X[10]), topk=1)[0].id != "d10"
    c._impl.close()


def test_writes_during_optimize_survive(tmp_path, schema, rng):
    """Delete + update racing the merge must win over the compacted copy."""
    c = zvec_tpu.create_and_open(str(tmp_path / "c"), schema)
    X = rng.standard_normal((400, 16)).astype(np.float32)
    for lo in range(0, 400, 100):
        c.insert(
            [
                Doc(id=f"d{i}", vectors={"emb": X[i]}, fields={"price": float(i)})
                for i in range(lo, lo + 100)
            ]
        )

    impl = c._impl
    raced = threading.Event()
    orig_build = impl._build_indexes_for

    def slow_build(seg):
        if seg in impl.segments:  # seal-time build (phase 1, lock held) — skip
            return orig_build(seg)
        # target build, phase 2 (outside the lock): race a delete + an update
        newv = rng.standard_normal(16).astype(np.float32)
        c.delete("d5")
        c.update(Doc(id="d6", vectors={"emb": newv}, fields={"price": 999.0}))
        c._race_vec = newv
        raced.set()
        return orig_build(seg)

    impl._build_indexes_for = slow_build
    c.optimize()
    impl._build_indexes_for = orig_build
    assert raced.is_set()

    assert c.fetch("d5") == {}
    got = c.fetch("d6")["d6"]
    assert got.field("price") == 999.0
    top = c.query(VectorQuery("emb", vector=c._race_vec), topk=1)
    assert top[0].id == "d6"
    # the stale compacted copies must not surface
    res = c.query(VectorQuery("emb", vector=X[5]), topk=3)
    assert all(r.id != "d5" for r in res)
    # reopen: reconciliation must be durable
    c.flush()
    c._impl.close()
    c2 = zvec_tpu.open(str(tmp_path / "c"))
    assert c2.fetch("d5") == {}
    assert c2.fetch("d6")["d6"].field("price") == 999.0
    c2._impl.close()


def test_optimize_single_fully_alive_segment_is_in_place(tmp_path, schema, rng):
    """One sealed segment with zero tombstones: optimize() must not rewrite
    the segment (no new segment dir), only build indexes + commit."""
    c = zvec_tpu.create_and_open(str(tmp_path / "triv"), schema)
    xs = rng.standard_normal((100, 16)).astype(np.float32)
    c.insert([Doc(id=str(i), vectors={"emb": xs[i]}) for i in range(100)])
    c.optimize()  # seals + trivial path
    seg_ids = [s.meta.segment_id for s in c._impl.segments]
    dirs_before = sorted(
        d for d in __import__("os").listdir(c.path) if d.startswith("seg_")
    )
    c.optimize()  # second optimize: single fully-alive segment -> no-op merge
    assert [s.meta.segment_id for s in c._impl.segments] == seg_ids
    dirs_after = sorted(
        d for d in __import__("os").listdir(c.path) if d.startswith("seg_")
    )
    assert dirs_after == dirs_before
    res = c.query(VectorQuery("emb", vector=xs[7]), topk=1)
    assert res[0].id == "7"


def test_optimize_builds_index_exactly_once(tmp_path, rng):
    """optimize() seals (building the index) and then takes the trivial
    single-segment path — which must NOT rebuild the identical-params index
    a second time (at 10M that second build costs hours)."""
    from zvec_tpu import HnswIndexParam

    schema = CollectionSchema(
        "once",
        vectors=[
            VectorSchema(
                "emb", DataType.VECTOR_FP32, 16,
                HnswIndexParam(MetricType.L2, m=8, ef_construction=50),
            )
        ],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "once"), schema)
    xs = rng.standard_normal((200, 16)).astype(np.float32)
    c.insert([Doc(id=str(i), vectors={"emb": xs[i]}) for i in range(200)])
    c.optimize()
    seg = c._impl.segments[0]
    eng = seg.engine_for("emb")
    assert eng.stats.build_count == 1, eng.stats.build_count
    c.optimize()  # trivial path again: same engine, still one build
    assert c._impl.segments[0].engine_for("emb") is eng
    assert eng.stats.build_count == 1, eng.stats.build_count
    res = c.query(VectorQuery("emb", vector=xs[7]), topk=1)
    assert res[0].id == "7"


def test_optimize_with_tombstones_still_compacts(tmp_path, schema, rng):
    c = zvec_tpu.create_and_open(str(tmp_path / "nontrw"), schema)
    xs = rng.standard_normal((100, 16)).astype(np.float32)
    c.insert([Doc(id=str(i), vectors={"emb": xs[i]}) for i in range(100)])
    c.optimize()
    c.delete([str(i) for i in range(50)])
    c.optimize()  # tombstones present -> real merge drops them
    assert c._impl.segments[0].doc_count == 50
    assert c.stats.doc_count == 50
    res = c.query(VectorQuery("emb", vector=xs[80]), topk=1)
    assert res[0].id == "80"
