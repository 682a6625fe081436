"""Model-based randomized DML/lifecycle test.

A random walk over insert/update/upsert/delete/flush/optimize/reopen is
mirrored into a plain-dict oracle; after every lifecycle event the
collection must agree with the oracle on membership (fetch), field values,
vectors, and exact flat-query ranking. The batched analog of the
reference's DML/open detail suites (`python/tests/detail/test_collection_
dml.py`, `test_collection_open.py`)."""

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

D = 12


def _mkdoc(rng, pk, tag=None):
    return Doc(
        id=pk,
        fields={"n": int(rng.integers(0, 100)), "tag": tag or f"t{int(rng.integers(0, 5))}"},
        vectors={"v": rng.standard_normal(D).astype(np.float32)},
    )


def _check(col, oracle):
    # membership + values via fetch
    got = col.fetch(list(oracle))
    assert set(got) == set(oracle)
    for pk, doc in oracle.items():
        g = got[pk]
        assert g.fields["n"] == doc.fields["n"], pk
        assert g.fields["tag"] == doc.fields["tag"], pk
    # ghosts stay gone
    missing = col.fetch(["ghost-1", "ghost-2"])
    assert missing == {}
    # exact ranking vs oracle brute force (query near a random live doc)
    if oracle:
        pks = sorted(oracle)
        X = np.stack([np.asarray(oracle[pk].vector("v")) for pk in pks])
        q = X[0] + 0.01
        hits = col.query(VectorQuery("v", vector=q), topk=min(5, len(pks)))
        d2 = ((X - q) ** 2).sum(1)
        expect = [pks[i] for i in np.argsort(d2, kind="stable")[: len(hits)]]
        assert [h.id for h in hits] == expect


def test_random_walk_vs_oracle(tmp_path):
    rng = np.random.default_rng(20260817)
    path = str(tmp_path / "mb")
    schema = CollectionSchema("col_mb",
        fields=[FieldSchema("n", DataType.INT64), FieldSchema("tag", DataType.STRING)],
        vectors=[
            VectorSchema("v", DataType.VECTOR_FP32, D, FlatIndexParam(MetricType.L2))
        ],
    )
    col = zvec_tpu.create_and_open(path, schema)
    oracle = {}
    next_id = 0

    for step in range(220):
        op = rng.choice(
            ["insert", "update", "upsert", "delete", "flush", "optimize", "reopen"],
            p=[0.42, 0.12, 0.12, 0.12, 0.1, 0.05, 0.07],
        )
        if op == "insert":
            k = int(rng.integers(1, 6))
            docs = []
            for _ in range(k):
                pk = f"p{next_id}"
                next_id += 1
                docs.append(_mkdoc(rng, pk))
            sts = col.insert(docs)
            assert all(s for s in sts)
            for d in docs:
                oracle[d.id] = d
            # duplicate insert must fail and not mutate
            dup = col.insert(Doc(id=docs[0].id, fields={"n": -1, "tag": "x"},
                                 vectors={"v": np.zeros(D, np.float32)}))
            assert not dup
        elif op == "update" and oracle:
            pk = str(rng.choice(sorted(oracle)))
            nd = _mkdoc(rng, pk)
            st = col.update(nd)
            assert st
            oracle[pk] = nd
            # updating a missing pk fails
            assert not col.update(_mkdoc(rng, "ghost-1"))
        elif op == "upsert":
            if oracle and rng.random() < 0.5:
                pk = str(rng.choice(sorted(oracle)))
            else:
                pk = f"p{next_id}"
                next_id += 1
            nd = _mkdoc(rng, pk)
            assert col.upsert(nd)
            oracle[pk] = nd
        elif op == "delete" and oracle:
            pk = str(rng.choice(sorted(oracle)))
            assert col.delete(pk)
            del oracle[pk]
            assert not col.delete("ghost-2")
        elif op == "flush":
            col.flush()
        elif op == "optimize":
            col.flush()
            col.optimize()
        elif op == "reopen":
            col.flush()
            col._impl.close()
            col = zvec_tpu.open(path)
        if op in ("flush", "optimize", "reopen") or step % 40 == 0:
            _check(col, oracle)

    _check(col, oracle)
    assert len(oracle) > 20  # the walk actually built something
    stats = col.stats  # property, reference collection.py:84
    assert stats.doc_count == len(oracle)
