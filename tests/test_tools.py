"""Tools tests: vecs IO + build/bench/recall CLIs end-to-end."""

import json

import numpy as np
import pytest

from zvec_tpu.tools.io import read_vecs, write_vecs
from zvec_tpu.tools.recall import compute_recall


def test_vecs_roundtrip(tmp_path, rng):
    data = rng.standard_normal((20, 7)).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    write_vecs(p, data)
    back = read_vecs(p)
    np.testing.assert_array_equal(back, data)
    assert read_vecs(p, limit=5).shape == (5, 7)

    ints = rng.integers(0, 100, (10, 4)).astype(np.int32)
    p2 = str(tmp_path / "x.ivecs")
    write_vecs(p2, ints)
    np.testing.assert_array_equal(read_vecs(p2), ints)


def test_compute_recall():
    got = np.array([[1, 2, 3], [4, 9, 6]])
    gt = np.array([[1, 2, 3], [4, 5, 6]])
    r = compute_recall(got, gt, [1, 3])
    assert r["recall@1"] == 1.0
    assert r["recall@3"] == 5 / 6


def test_build_bench_recall_cli(tmp_path, rng, capsys):
    from zvec_tpu.tools import bench, build, recall

    base = rng.standard_normal((300, 12)).astype(np.float32)
    queries = base[:10] + 0.01 * rng.standard_normal((10, 12)).astype(np.float32)
    gt = np.argsort(((queries[:, None, :] - base[None, :, :]) ** 2).sum(-1), axis=1)[
        :, :10
    ].astype(np.int32)

    write_vecs(str(tmp_path / "base.fvecs"), base)
    write_vecs(str(tmp_path / "q.fvecs"), queries)
    write_vecs(str(tmp_path / "gt.ivecs"), gt)

    build.main(
        [
            "--output", str(tmp_path / "col"),
            "--vectors", str(tmp_path / "base.fvecs"),
            "--index", "flat", "--metric", "l2",
        ]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["docs"] == 300

    recall.main(
        [
            "--collection", str(tmp_path / "col"),
            "--field", "emb",
            "--queries", str(tmp_path / "q.fvecs"),
            "--ground-truth", str(tmp_path / "gt.ivecs"),
            "--topk", "1,10",
        ]
    )
    out = json.loads(capsys.readouterr().out)
    assert out["recall@10"] == 1.0  # flat scan is exact

    bench.main(
        [
            "--collection", str(tmp_path / "col"),
            "--field", "emb",
            "--queries", str(tmp_path / "q.fvecs"),
            "--seconds", "0.5",
            "--batch", "4",
        ]
    )
    out = json.loads(capsys.readouterr().out)
    assert out["qps"] > 0 and "p99" in out


def test_parquet_dataset_prep(tmp_path):
    """Cohere-parquet prep parity (`convert_cohere_parquet.py`): list<float>
    embedding column -> vector matrix (+ neighbors file)."""
    pa = pytest.importorskip("pyarrow")
    import pyarrow.parquet as pq

    from zvec_tpu.tools.io import (
        convert_parquet_dataset,
        load_vectors,
        read_parquet_vectors,
    )

    rng = np.random.default_rng(0)
    X = rng.standard_normal((37, 8)).astype(np.float32)
    G = rng.integers(0, 37, (37, 5)).astype(np.int64)
    tbl = pa.table(
        {
            "id": pa.array(range(37)),
            "emb": pa.array(X.tolist(), pa.list_(pa.float32())),
            "neighbors_id": pa.array(G.tolist(), pa.list_(pa.int64())),
        }
    )
    p = str(tmp_path / "shard.parquet")
    pq.write_table(tbl, p)

    assert np.allclose(read_parquet_vectors(p), X)
    assert read_parquet_vectors(p, limit=10).shape == (10, 8)
    assert np.allclose(load_vectors(p, limit=5), X[:5])
    with pytest.raises(ValueError):
        read_parquet_vectors(p, column="nope")

    out_v = str(tmp_path / "v.npy")
    out_g = str(tmp_path / "g.npy")
    n = convert_parquet_dataset(
        [p], out_v, neighbors_column="neighbors_id", out_neighbors=out_g
    )
    assert n == 37
    assert np.allclose(np.load(out_v), X)
    assert np.array_equal(np.load(out_g), G)

    # fvecs round trip of the converted output
    out_f = str(tmp_path / "v.fvecs")
    convert_parquet_dataset([p], out_f, limit=12)
    assert np.allclose(load_vectors(out_f), X[:12])
