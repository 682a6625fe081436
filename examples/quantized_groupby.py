"""INT8-quantized cosine search, refined re-ranking, and group-by.

Mirrors the reference's Cohere-style workload shape (cosine metric +
Int8 converter, `tools/core/README.md:95-131`) plus the C++-only
GroupByQuery surface (`python_collection.cc:203`).

Run: python examples/quantized_groupby.py  (CPU or TPU)
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
    MetricType,
    QuantizeType,
    VectorQuery,
    VectorSchema,
)

PATH = "/tmp/zvec_tpu_quantized_groupby"
N, D = 5000, 64


def main():
    shutil.rmtree(PATH, ignore_errors=True)
    zvec_tpu.init()

    # int8-quantized cosine HNSW: codes live in HBM at 1/4 fp32 size and
    # score asymmetrically (fp32 query vs int8 codes, dequant fused into
    # the matmul epilogue)
    schema = CollectionSchema(
        "articles",
        fields=[FieldSchema("topic", DataType.STRING)],
        vectors=[
            VectorSchema(
                "emb",
                DataType.VECTOR_FP32,
                D,
                HnswIndexParam(
                    MetricType.COSINE, m=24, quantize_type=QuantizeType.INT8
                ),
            )
        ],
    )
    col = zvec_tpu.create_and_open(PATH, schema)

    rng = np.random.default_rng(11)
    topics = ["science", "sports", "finance", "art"]
    centers = {t: rng.standard_normal(D).astype(np.float32) * 3 for t in topics}
    docs = []
    for i in range(N):
        t = topics[i % len(topics)]
        v = centers[t] + rng.standard_normal(D).astype(np.float32)
        docs.append(Doc(id=f"a{i}", fields={"topic": t}, vectors={"emb": v}))
    for lo in range(0, N, 1000):
        col.insert(docs[lo : lo + 1000])
    col.optimize()  # seal + build the quantized graph

    q = centers["science"] + 0.5 * rng.standard_normal(D).astype(np.float32)

    # plain quantized search
    hits = col.query(VectorQuery("emb", vector=q), topk=5)
    print("int8 cosine top-5:", [(h.id, round(h.score, 4)) for h in hits])

    # refined search: quantized scan overscans, then exact fp32 re-rank
    refined = col.query(
        VectorQuery("emb", vector=q, param=HnswQueryParam(is_using_refiner=True)),
        topk=5,
    )
    print("refined top-5:    ", [(h.id, round(h.score, 4)) for h in refined])

    # hybrid: filter to one topic
    sports = col.query(
        VectorQuery("emb", vector=q), topk=3, filter="topic = 'sports'",
        output_fields=["topic"],
    )
    assert all(h.fields["topic"] == "sports" for h in sports)
    print("filtered (sports):", [h.id for h in sports])

    # group-by: best 2 docs from each of the 3 closest topics
    grouped = col.group_by_query(
        VectorQuery("emb", vector=q),
        group_by_field="topic",
        group_count=3,
        group_topk=2,
        output_fields=["topic"],
    )
    by_topic = {}
    for h in grouped:
        by_topic.setdefault(h.fields["topic"], []).append(h.id)
    print("group-by:", by_topic)
    assert len(by_topic) == 3 and all(len(v) == 2 for v in by_topic.values())
    print("OK")


if __name__ == "__main__":
    main()
