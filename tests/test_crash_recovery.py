"""Crash-atomicity of the checkpoint/WAL/version protocol.

Reference analog: the WAL is dropped only after the manifest commit
(`segment.cc:2160-2168`), and recovery replays it over the last checkpoint
(`collection.cc:1632-1690`). Each test drives the collection to a specific
crash point (in-memory state abandoned, only fsync'd files survive) and
reopens from disk.
"""

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
from zvec_tpu.model.param.param import InvertIndexParam


@pytest.fixture
def schema():
    return CollectionSchema(
        "crash",
        fields=[FieldSchema("price", DataType.DOUBLE, nullable=True)],
        vectors=[
            VectorSchema("emb", DataType.VECTOR_FP32, 8, FlatIndexParam(MetricType.L2))
        ],
    )


def make_docs(rng, n, start=0):
    vecs = rng.standard_normal((n, 8)).astype(np.float32)
    docs = [
        Doc(id=f"d{start + i}", vectors={"emb": vecs[i]}, fields={"price": float(i)})
        for i in range(n)
    ]
    return docs, vecs


def crash_and_reopen(coll):
    """Abandon in-memory state; reopen from whatever is on disk."""
    path = coll._impl.path
    coll._impl.close()
    return zvec_tpu.open(path)


def test_recovery_with_unflushed_wal_after_version_commit(tmp_path, schema, rng):
    """A version committed while the WAL holds unflushed records (create_index
    does this) must not break recovery's doc_id accounting."""
    c = zvec_tpu.create_and_open(str(tmp_path / "c"), schema)
    docs, vecs = make_docs(rng, 10)
    c.insert(docs)
    # commits a version with next_doc_id ahead of the (empty) checkpoint
    c.create_index("price", InvertIndexParam())
    c2 = crash_and_reopen(c)
    assert c2.stats.doc_count == 10
    assert c2.query(VectorQuery("emb", vector=vecs[4]), topk=1)[0].id == "d4"
    # allocation must continue contiguously
    more, _ = make_docs(rng, 3, start=10)
    assert all(s.is_ok() for s in c2.insert(more))
    assert c2.stats.doc_count == 13
    c2._impl.close()


def test_crash_between_checkpoint_and_commit(tmp_path, schema, rng):
    """ckpt_{g+1}+wal_{g+1} written but version not committed: recovery must
    come up on the generation-g pair with no duplicates and no loss."""
    c = zvec_tpu.create_and_open(str(tmp_path / "c"), schema)
    docs, vecs = make_docs(rng, 8)
    c.insert(docs)
    impl = c._impl
    impl.writing.write_checkpoint()  # phase 1 only — "crash" before commit
    c2 = crash_and_reopen(c)
    assert c2.stats.doc_count == 8
    ids = [r.id for r in c2.query(VectorQuery("emb", vector=vecs[2]), topk=3)]
    assert ids[0] == "d2"
    c2._impl.close()


def test_crash_between_commit_and_gc(tmp_path, schema, rng):
    """Version committed, old generation files not yet deleted: recovery uses
    the committed pair and GCs the stale files."""
    import os

    c = zvec_tpu.create_and_open(str(tmp_path / "c"), schema)
    docs, vecs = make_docs(rng, 8)
    c.insert(docs)
    impl = c._impl
    impl.writing.write_checkpoint()
    impl._snapshot_maps()
    impl._commit_version()  # "crash" before gc_stale_files()
    seg_dir = impl.writing.directory
    assert os.path.exists(os.path.join(seg_dir, "wal_0.log"))
    c2 = crash_and_reopen(c)
    assert c2.stats.doc_count == 8
    # stale generation-0 files were GC'd on open
    assert not os.path.exists(os.path.join(seg_dir, "wal_0.log"))
    assert c2.query(VectorQuery("emb", vector=vecs[7]), topk=1)[0].id == "d7"
    c2._impl.close()


def test_no_duplicate_replay_after_flush(tmp_path, schema, rng):
    """Records checkpointed by flush must not be replayed from any WAL."""
    c = zvec_tpu.create_and_open(str(tmp_path / "c"), schema)
    docs, vecs = make_docs(rng, 6)
    c.insert(docs)
    c.flush()
    more, _ = make_docs(rng, 4, start=6)
    c.insert(more)  # in wal_1 only
    c2 = crash_and_reopen(c)
    assert c2.stats.doc_count == 10
    assert c2.query(VectorQuery("emb", vector=vecs[1]), topk=1)[0].id == "d1"
    c2._impl.close()


def test_update_then_crash(tmp_path, schema, rng):
    c = zvec_tpu.create_and_open(str(tmp_path / "c"), schema)
    docs, vecs = make_docs(rng, 5)
    c.insert(docs)
    c.flush()
    newv = rng.standard_normal(8).astype(np.float32)
    c.update(Doc(id="d2", vectors={"emb": newv}, fields={"price": 99.0}))
    c2 = crash_and_reopen(c)
    assert c2.stats.doc_count == 5
    top = c2.query(VectorQuery("emb", vector=newv), topk=1)[0]
    assert top.id == "d2"
    assert c2.fetch("d2")["d2"].field("price") == 99.0
    c2._impl.close()


def test_delete_then_crash(tmp_path, schema, rng):
    c = zvec_tpu.create_and_open(str(tmp_path / "c"), schema)
    docs, vecs = make_docs(rng, 5)
    c.insert(docs)
    c.flush()
    c.delete("d3")
    c2 = crash_and_reopen(c)
    assert c2.stats.doc_count == 4
    ids = [r.id for r in c2.query(VectorQuery("emb", vector=vecs[3]), topk=5)]
    assert "d3" not in ids
    c2._impl.close()


def test_update_does_not_rotate_mid_apply(tmp_path, rng):
    """Updates on a full segment must keep the WAL record and the re-insert
    in the same segment (no mid-apply rotation data loss)."""
    schema = CollectionSchema(
        "rot",
        fields=[FieldSchema("price", DataType.DOUBLE, nullable=True)],
        vectors=[
            VectorSchema("emb", DataType.VECTOR_FP32, 8, FlatIndexParam(MetricType.L2))
        ],
        max_doc_count_per_segment=4,
    )
    c = zvec_tpu.create_and_open(str(tmp_path / "c"), schema)
    docs, vecs = make_docs(rng, 4)  # exactly fills the segment
    c.insert(docs)
    newv = rng.standard_normal(8).astype(np.float32)
    c.update(Doc(id="d1", vectors={"emb": newv}, fields={"price": 77.0}))
    c2 = crash_and_reopen(c)
    assert c2.stats.doc_count == 4
    assert c2.query(VectorQuery("emb", vector=newv), topk=1)[0].id == "d1"
    assert c2.fetch("d1")["d1"].field("price") == 77.0
    c2._impl.close()


def test_crash_mid_compaction_before_swap(tmp_path, schema, rng):
    """An orphan compaction target dir (written, never committed) is removed
    on open and the sources keep serving."""
    import os

    c = zvec_tpu.create_and_open(str(tmp_path / "c"), schema)
    docs, vecs = make_docs(rng, 6)
    c.insert(docs)
    impl = c._impl
    impl._seal_writing_segment()
    # simulate a half-written compaction target
    orphan = os.path.join(impl.path, "seg_99")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "forward.arrow"), "wb") as fh:
        fh.write(b"garbage")
    c2 = crash_and_reopen(c)
    assert not os.path.exists(orphan)
    assert c2.stats.doc_count == 6
    c2._impl.close()


def test_crash_inside_commit_before_current_swing(tmp_path, schema, rng, monkeypatch):
    """Fault injection inside VersionManager.commit: the new version file is
    fsync'd but the process dies before CURRENT swings. Recovery must come up
    on the OLD version and replay the WAL; the next flush must be able to
    reuse/overwrite the orphan version file."""
    import os

    import zvec_tpu.db.version as vmod

    c = zvec_tpu.create_and_open(str(tmp_path / "c"), schema)
    docs, vecs = make_docs(rng, 6)
    c.insert(docs)
    c.flush()  # durable generation
    more, mvecs = make_docs(rng, 4, start=6)
    c.insert(more)  # WAL-only

    real_replace = os.replace

    def bomb(src, dst):
        if os.path.basename(dst) == "CURRENT":
            raise OSError("injected crash before CURRENT swing")
        return real_replace(src, dst)

    monkeypatch.setattr(vmod.os, "replace", bomb)
    with pytest.raises(OSError):
        c.flush()
    monkeypatch.setattr(vmod.os, "replace", real_replace)

    # the orphan version file exists but CURRENT still names the old version
    impl = c._impl
    orphans = [n for n in os.listdir(impl.path) if n.startswith("version_")]
    assert orphans

    c2 = crash_and_reopen(c)
    assert c2.stats.doc_count == 10
    assert c2.query(VectorQuery("emb", vector=mvecs[1]), topk=1)[0].id == "d7"
    # a full flush cycle after recovery overwrites the orphan and works
    c2.flush()
    c3 = crash_and_reopen(c2)
    assert c3.stats.doc_count == 10
    c3._impl.close()


def test_leftover_tmp_files_ignored_on_open(tmp_path, schema, rng):
    """Torn .tmp files from a crashed commit must not break recovery."""
    import os

    c = zvec_tpu.create_and_open(str(tmp_path / "c"), schema)
    docs, vecs = make_docs(rng, 5)
    c.insert(docs)
    c.flush()
    impl = c._impl
    with open(os.path.join(impl.path, "CURRENT.tmp"), "w") as fh:
        fh.write("999")  # torn: never replaced
    with open(os.path.join(impl.path, "version_999.json.tmp"), "w") as fh:
        fh.write("{ torn json")
    c2 = crash_and_reopen(c)
    assert c2.stats.doc_count == 5
    assert c2.query(VectorQuery("emb", vector=vecs[0]), topk=1)[0].id == "d0"
    c2._impl.close()


def test_orphan_snapshots_gcd_by_next_flush(tmp_path, schema, rng):
    """Snapshot files written for a version that never committed are swept by
    the next successful flush's snapshot GC."""
    import os

    c = zvec_tpu.create_and_open(str(tmp_path / "c"), schema)
    docs, _ = make_docs(rng, 5)
    c.insert(docs)
    impl = c._impl
    impl.writing.write_checkpoint()
    impl._snapshot_maps()  # writes idmap_{v+1}/deletes_{v+1}, then "crash"
    c2 = crash_and_reopen(c)
    assert c2.stats.doc_count == 5
    c2.flush()
    snaps = [
        n
        for n in os.listdir(c2._impl.path)
        if n.startswith("idmap_") or n.startswith("deletes_")
    ]
    # exactly one live pair remains
    assert len(snaps) == 2
    c2._impl.close()
