"""Quickstart: create a collection, insert docs, hybrid search.

Run: python examples/quickstart.py  (CPU or TPU)
"""

import os

if os.environ.get("ZVEC_EXAMPLE_CPU") == "1":  # run off-TPU: CPU backend
    import jax

    jax.config.update("jax_platforms", "cpu")

import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import zvec_tpu
from zvec_tpu import (
    CollectionSchema,
    DataType,
    Doc,
    FieldSchema,
    HnswIndexParam,
    HnswQueryParam,
    InvertIndexParam,
    MetricType,
    QuantizeType,
    VectorQuery,
    VectorSchema,
)

PATH = "/tmp/zvec_tpu_quickstart"


def main():
    shutil.rmtree(PATH, ignore_errors=True)
    zvec_tpu.init()

    schema = CollectionSchema(
        "products",
        fields=[
            FieldSchema("title", DataType.STRING),
            FieldSchema(
                "price",
                DataType.DOUBLE,
                index_param=InvertIndexParam(enable_range_optimization=True),
            ),
            FieldSchema("tags", DataType.ARRAY_STRING, nullable=True),
        ],
        vectors=[
            VectorSchema(
                "emb",
                DataType.VECTOR_FP32,
                64,
                HnswIndexParam(
                    MetricType.COSINE, m=16, quantize_type=QuantizeType.INT8
                ),
            )
        ],
    )
    coll = zvec_tpu.create_and_open(PATH, schema)

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((1000, 64)).astype(np.float32)
    coll.insert(
        [
            Doc(
                id=f"p{i}",
                vectors={"emb": vecs[i]},
                fields={
                    "title": f"product {i}",
                    "price": float(i % 200),
                    "tags": ["sale"] if i % 10 == 0 else ["regular"],
                },
            )
            for i in range(1000)
        ]
    )
    print("inserted:", coll.stats.doc_count, "docs")

    hits = coll.query(
        VectorQuery("emb", vector=vecs[42], param=HnswQueryParam(ef=200)),
        topk=5,
        filter="price < 100 AND tags CONTAIN_ANY ('sale')",
        output_fields=["title", "price"],
    )
    for h in hits:
        print(f"  {h.id}  score={h.score:.4f}  {h.fields}")

    coll.flush()
    coll.destroy()


if __name__ == "__main__":
    main()
