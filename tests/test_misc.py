"""Group-by search, concurrency hammering, profiler, config tests.

Reference analogs: GroupByQuery (`sqlengine_impl.cc:93-121`), concurrency
suite (`python/tests/detail/test_collection_concurrency.py:89-344`), Profiler
(`src/db/common/profiler.h:26-105`), GlobalConfig (`config.cc:33-135`).
"""

import json
import threading

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
from zvec_tpu.utils.config import GlobalConfig
from zvec_tpu.utils.profiler import Profiler


@pytest.fixture
def coll(tmp_path, rng):
    schema = CollectionSchema("col_m",
        fields=[FieldSchema("grp", DataType.STRING), FieldSchema("n", DataType.INT64)],
        vectors=[
            VectorSchema("e", DataType.VECTOR_FP32, 8, FlatIndexParam(MetricType.L2))
        ],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "m"), schema)
    xs = rng.standard_normal((60, 8)).astype(np.float32)
    c.insert(
        [
            Doc(id=f"d{i}", vectors={"e": xs[i]}, fields={"grp": f"g{i % 4}", "n": i})
            for i in range(60)
        ]
    )
    c._xs = xs
    yield c
    c._impl.close()


def test_group_by_query(coll):
    res = coll.group_by_query(
        VectorQuery("e", vector=coll._xs[0]),
        group_by_field="grp",
        group_count=3,
        group_topk=2,
    )
    # 3 groups x up to 2 docs, each doc's group matches, best-first groups
    groups = [r.field("grp") for r in res]
    assert len(res) == 6
    assert len(set(groups)) == 3
    # first group contains the best overall hit (d0 itself)
    assert res[0].id == "d0"
    # within each group, docs sorted by score ascending (L2)
    from itertools import groupby

    for g, items in groupby(res, key=lambda r: r.field("grp")):
        scores = [r.score for r in items]
        assert scores == sorted(scores)


def test_group_by_skewed_groups(tmp_path, rng):
    """One giant group hogs the neighborhood: the scan must widen until
    `group_count` full groups are found (fixed overscan returned < count)."""
    schema = CollectionSchema(
        "skew",
        fields=[FieldSchema("grp", DataType.STRING)],
        vectors=[
            VectorSchema("e", DataType.VECTOR_FP32, 8, FlatIndexParam(MetricType.L2))
        ],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "s"), schema)
    q = rng.standard_normal(8).astype(np.float32)
    docs = []
    # 500 docs of group "big" packed tightly around the query...
    for i in range(500):
        v = q + rng.standard_normal(8).astype(np.float32) * 0.01
        docs.append(Doc(id=f"b{i}", vectors={"e": v}, fields={"grp": "big"}))
    # ...and 4 tiny groups with 2 docs each, much farther away
    for gi in range(4):
        for j in range(2):
            v = q + 10.0 * (gi + 1) + rng.standard_normal(8).astype(np.float32)
            docs.append(
                Doc(id=f"g{gi}_{j}", vectors={"e": v}, fields={"grp": f"tiny{gi}"})
            )
    for lo in range(0, len(docs), 500):
        c.insert(docs[lo : lo + 500])
    res = c.group_by_query(
        VectorQuery("e", vector=q),
        group_by_field="grp",
        group_count=5,
        group_topk=2,
    )
    groups = {}
    for r in res:
        groups.setdefault(r.field("grp"), []).append(r.id)
    assert len(groups) == 5, groups.keys()
    assert all(len(v) == 2 for v in groups.values()), groups
    c._impl.close()


def test_group_by_unknown_field(coll):
    with pytest.raises(Exception):
        coll.group_by_query(
            VectorQuery("e", vector=coll._xs[0]), group_by_field="nope"
        )


def test_concurrent_read_write(tmp_path, rng):
    schema = CollectionSchema("col_cc",
        vectors=[
            VectorSchema("e", DataType.VECTOR_FP32, 8, FlatIndexParam(MetricType.IP))
        ],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "cc"), schema)
    xs = rng.standard_normal((400, 8)).astype(np.float32)
    c.insert([Doc(id=f"w{i}", vectors={"e": xs[i]}) for i in range(100)])

    errors = []

    def writer():
        try:
            for i in range(100, 250):
                c.insert(Doc(id=f"w{i}", vectors={"e": xs[i]}))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def deleter():
        try:
            for i in range(0, 50):
                c.delete(f"w{i}")
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def reader():
        try:
            for _ in range(30):
                res = c.query(VectorQuery("e", vector=xs[60]), topk=5)
                assert len(res) <= 5
                c.fetch("w60")
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [
        threading.Thread(target=writer),
        threading.Thread(target=deleter),
        threading.Thread(target=reader),
        threading.Thread(target=reader),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert c.stats.doc_count == 200  # 250 inserted - 50 deleted
    res = c.query(VectorQuery("e", vector=xs[200]), topk=1)
    assert res[0].id == "w200"
    c._impl.close()


def test_profiler_tree():
    p = Profiler(enabled=True, trace_id="t-1")
    with p.stage("analyze"):
        pass
    with p.stage("plan"):
        with p.stage("vector_scan"):
            pass
    p.finish()
    tree = json.loads(p.to_json())
    assert tree["trace_id"] == "t-1"
    names = [c["stage"] for c in tree["children"]]
    assert names == ["analyze", "plan"]
    assert tree["children"][1]["children"][0]["stage"] == "vector_scan"
    assert tree["ms"] >= 0


def test_profiler_disabled_is_noop():
    p = Profiler(enabled=False)
    with p.stage("x"):
        pass
    p.finish()
    assert "children" not in json.loads(p.to_json())


def test_global_config_validation():
    cfg = GlobalConfig()
    with pytest.raises(ValueError):
        cfg.initialize(query_threads=0)
    cfg2 = GlobalConfig()
    with pytest.raises(ValueError):
        cfg2.initialize(invert_to_forward_scan_ratio=1.5)
    cfg3 = GlobalConfig()
    cfg3.initialize(query_threads=2, memory_limit_mb=512)
    assert cfg3.query_threads == 2
    # repeated initialize is a silent no-op (reference parity): values
    # from the second call are ignored, the first init's state survives
    cfg3.initialize(query_threads=7)
    assert cfg3.query_threads == 2


def test_cgroup_defaults():
    from zvec_tpu.utils.config import cgroup_cpu_limit, cgroup_memory_limit_mb

    assert cgroup_cpu_limit() >= 1
    assert cgroup_memory_limit_mb() > 0


def test_query_profiling(coll):
    coll._impl.debug_profiling = True
    coll.query(VectorQuery("e", vector=coll._xs[0]), topk=3, filter="n < 30")
    tree = json.loads(coll._impl.last_profile)
    names = [c["stage"] for c in tree["children"]]
    assert any("filter" in n for n in names)
    assert any("vector_scan" in n for n in names)


def test_group_by_sparse_vector(tmp_path, rng):
    from zvec_tpu import FlatIndexParam

    schema = zvec_tpu.CollectionSchema("col_gs",
        fields=[FieldSchema("g", DataType.STRING)],
        vectors=[
            VectorSchema("sv", DataType.SPARSE_VECTOR_FP32, 0, FlatIndexParam(MetricType.IP))
        ],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "gs"), schema)
    rows = [{int(d): 1.0 for d in rng.choice(50, 5, replace=False)} for _ in range(30)]
    c.insert(
        [
            Doc(id=f"s{i}", vectors={"sv": rows[i]}, fields={"g": f"g{i%3}"})
            for i in range(30)
        ]
    )
    res = c.group_by_query(
        zvec_tpu.VectorQuery("sv", vector=rows[0]),
        group_by_field="g",
        group_count=2,
        group_topk=1,
    )
    assert len(res) == 2 and res[0].id == "s0"
    c._impl.close()


def test_topk_validation(coll):
    with pytest.raises(Exception):
        coll.query(VectorQuery("e", vector=coll._xs[0]), topk=0)


def test_no_vector_collection_scan(tmp_path):
    """Schemas without vector fields use the filter-only scan executor."""
    schema = zvec_tpu.CollectionSchema("col_nv",
        fields=[
            FieldSchema("name", DataType.STRING),
            FieldSchema("age", DataType.INT64),
        ],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "nv"), schema)
    c.insert(
        [
            Doc(id=f"u{i}", fields={"name": f"user{i}", "age": 20 + i})
            for i in range(30)
        ]
    )
    res = c.query(topk=5, filter="age >= 40")
    assert len(res) == 5
    assert all(r.field("age") >= 40 for r in res)
    res = c.query(topk=100)
    assert len(res) == 30
    with pytest.raises(ValueError):
        c.query(VectorQuery("none", vector=[1.0]), topk=3)
    c._impl.close()


def test_radius_across_segments(tmp_path, rng):
    """Radius range search applies across sealed + writing segments (any
    engine), not only inside the HNSW kernel."""
    from zvec_tpu import HnswIndexParam, HnswQueryParam

    schema = zvec_tpu.CollectionSchema(
        "rad",
        vectors=[
            VectorSchema(
                "e", DataType.VECTOR_FP32, 8,
                HnswIndexParam(MetricType.L2, m=8, ef_construction=40),
            )
        ],
        max_doc_count_per_segment=1100,
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "rad"), schema)
    xs = rng.standard_normal((1300, 8)).astype(np.float32)
    for s in range(0, 1300, 650):
        c.insert([Doc(id=f"r{i}", vectors={"e": xs[i]}) for i in range(s, s + 650)])
    # query near a doc in the WRITING segment (flat engine must honor radius)
    res = c.query(
        VectorQuery("e", vector=xs[1200], param=HnswQueryParam(ef=50, radius=2.0)),
        topk=20,
    )
    assert res and all(r.score <= 2.0 for r in res)
    assert res[0].id == "r1200"
    c._impl.close()


def test_engine_lifetime_stats(tmp_path, rng):
    """Per-runner lifetime stats roll up through CollectionStats
    (reference `index_runner.h:52-140`)."""
    schema = CollectionSchema("col_st",
        vectors=[
            VectorSchema("v", DataType.VECTOR_FP32, 8, FlatIndexParam(MetricType.L2))
        ],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "st"), schema)
    xs = rng.standard_normal((50, 8)).astype(np.float32)
    c.insert([Doc(id=str(i), vectors={"v": xs[i]}) for i in range(50)])
    st0 = c.stats
    assert st0.index_stats["v"]["search_count"] == 0

    for _ in range(3):
        c.query(VectorQuery("v", vector=xs[0]), topk=5)
    st = c.stats
    es = st.index_stats["v"]
    assert es["search_count"] == 3
    assert es["queries_served"] == 3
    assert es["build_count"] >= 1
    assert es["rows_built"] == 50
    assert es["total_search_secs"] > 0.0
    assert es["total_build_secs"] >= es["last_build_secs"] > 0.0


def test_group_by_disconnected_clusters(tmp_path, rng):
    """Well-separated clusters produce a cluster-local kNN graph; the beam
    exhausts one component, so group-by must escalate to the exact pass
    (plus NSW teleport links) to honor group_count."""
    import zvec_tpu
    from zvec_tpu import (
        CollectionSchema,
        DataType,
        Doc,
        FieldSchema,
        HnswIndexParam,
        MetricType,
        VectorQuery,
        VectorSchema,
    )

    D, per = 24, 700
    topics = ["a", "b", "c"]
    centers = {t: rng.standard_normal(D).astype(np.float32) * 6 for t in topics}
    schema = CollectionSchema(
        "gdc",
        fields=[FieldSchema("topic", DataType.STRING)],
        vectors=[
            VectorSchema(
                "v", DataType.VECTOR_FP32, D, HnswIndexParam(MetricType.L2, m=16)
            )
        ],
    )
    col = zvec_tpu.create_and_open(str(tmp_path / "c"), schema)
    docs = []
    for i in range(per * len(topics)):
        t = topics[i % len(topics)]
        v = centers[t] + rng.standard_normal(D).astype(np.float32)
        docs.append(Doc(id=f"d{i}", fields={"topic": t}, vectors={"v": v}))
    for lo in range(0, len(docs), 1000):
        col.insert(docs[lo : lo + 1000])
    col.optimize()
    q = centers["a"] + 0.2 * rng.standard_normal(D).astype(np.float32)
    hits = col.group_by_query(
        VectorQuery("v", vector=q),
        group_by_field="topic",
        group_count=3,
        group_topk=2,
        output_fields=["topic"],
    )
    got = {}
    for h in hits:
        got.setdefault(h.fields["topic"], []).append(h.id)
    assert set(got) == {"a", "b", "c"}
    assert all(len(v) == 2 for v in got.values())


def test_group_by_vector_query_typed(coll):
    """GroupByVectorQuery (reference `doc.h:370`) carries group params."""
    from zvec_tpu import GroupByVectorQuery

    q = coll._xs[0]
    res = coll.group_by_query(
        GroupByVectorQuery("e", vector=q, group_by_field="grp", group_count=3,
                           group_topk=2)
    )
    groups = [r.field("grp") for r in res]
    assert len(set(groups)) == 3
    # validation: missing group_by_field / bad counts
    import pytest as _pytest

    with _pytest.raises(ValueError):
        GroupByVectorQuery("e", vector=q)
    with _pytest.raises(ValueError):
        GroupByVectorQuery("e", vector=q, group_by_field="grp", group_count=0)


def test_grouped_multi_vector_fused(tmp_path, rng):
    """Grouped + multi-vector (VERDICT r2 missing #6): fused rerank feeds
    the per-group quotas."""
    import zvec_tpu
    from zvec_tpu import (
        CollectionSchema, DataType, Doc, FieldSchema, FlatIndexParam,
        GroupByVectorQuery, MetricType, RrfReRanker, VectorQuery, VectorSchema,
    )

    n, d = 400, 12
    X1 = rng.standard_normal((n, d)).astype(np.float32)
    X2 = rng.standard_normal((n, d)).astype(np.float32)
    schema = CollectionSchema(
        "gmv",
        fields=[FieldSchema("grp", DataType.STRING)],
        vectors=[
            VectorSchema("a", DataType.VECTOR_FP32, d, FlatIndexParam(MetricType.L2)),
            VectorSchema("b", DataType.VECTOR_FP32, d, FlatIndexParam(MetricType.L2)),
        ],
    )
    col = zvec_tpu.create_and_open(str(tmp_path / "gmv"), schema)
    col.insert(
        [
            Doc(id=str(i), fields={"grp": f"g{i % 8}"},
                vectors={"a": X1[i], "b": X2[i]})
            for i in range(n)
        ]
    )
    res = col.group_by_query(
        [
            GroupByVectorQuery("a", vector=X1[5], group_by_field="grp",
                               group_count=4, group_topk=2),
            VectorQuery("b", vector=X2[5]),
        ],
        reranker=RrfReRanker(),
    )
    groups = [r.field("grp") for r in res]
    assert len(set(groups)) == 4
    # doc 5 (exact match on both fields) leads its group, which leads all
    assert res[0].id == "5" and groups[0] == "g5"
    # quotas respected
    from collections import Counter

    assert all(v <= 2 for v in Counter(groups).values())
