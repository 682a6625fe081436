"""Multi-chip corpus sharding: one collection spread over a device mesh.

The TPU-native scale-out axis (SURVEY §2.9/§5.8): sealed segment codes shard
across the mesh's 'corpus' axis, every query fans out to all shards, and the
per-shard top-k merges with one all_gather over ICI. On a real pod this uses
the physical chips; here it runs on an 8-device virtual CPU mesh
(xla_force_host_platform_device_count) so the sharding compiles and executes
anywhere.

Run: ZVEC_EXAMPLE_CPU=1 python examples/mesh_sharding.py
"""

import os

if os.environ.get("ZVEC_EXAMPLE_CPU") == "1":  # run off-TPU: CPU backend
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

import zvec_tpu
from zvec_tpu import (
    CollectionSchema,
    DataType,
    Doc,
    FlatIndexParam,
    MetricType,
    VectorQuery,
    VectorSchema,
)
from zvec_tpu.utils.config import GlobalConfig

PATH = "/tmp/zvec_tpu_mesh_example"
N, D = 20_000, 64


def main():
    n_dev = len(jax.devices())
    print(f"devices: {n_dev} x {jax.devices()[0].platform}")
    # opt in to mesh sharding: sealed FLAT segments corpus-shard over all
    # devices (collection_mesh() in parallel/mesh.py)
    GlobalConfig.instance().mesh_devices = n_dev

    shutil.rmtree(PATH, ignore_errors=True)
    zvec_tpu.init()
    schema = CollectionSchema(
        "sharded",
        vectors=[
            VectorSchema("emb", DataType.VECTOR_FP32, D, FlatIndexParam(MetricType.L2))
        ],
    )
    col = zvec_tpu.create_and_open(PATH, schema)

    rng = np.random.default_rng(3)
    X = rng.standard_normal((N, D)).astype(np.float32)
    for lo in range(0, N, 1000):
        col.insert(
            [Doc(id=str(i), vectors={"emb": X[i]}) for i in range(lo, lo + 1000)]
        )
    col.optimize()  # seal -> codes shard over the 'corpus' mesh axis

    # show the placement: the engine's code table is split across devices
    seg = col._impl.segments[0]
    eng = seg.engine_for("emb")
    eng._ensure_fresh()
    shards = {str(s.device) for s in eng._st.codes.addressable_shards}
    print(f"code table lives on {len(shards)} devices")

    q = rng.standard_normal(D).astype(np.float32)
    hits = col.query(VectorQuery("emb", vector=q), topk=5)
    exact = np.argsort(((X - q) ** 2).sum(1))[:5]
    print("sharded top-5:", [h.id for h in hits])
    print("exact   top-5:", [str(i) for i in exact])
    assert [int(h.id) for h in hits] == exact.tolist()
    print("OK — per-shard scans merged over the mesh match the exact oracle")


if __name__ == "__main__":
    main()
