"""Property-based filter-language fuzz: random expressions vs a Python
oracle over both evaluator paths (writing-segment Python eval + sealed
segment Arrow fast path + inverted-index fast path).

Reference analog: the sqlengine analyzer/planner test volume
(`tests/db/sqlengine/query_info_test.cc`, `invert_recall_test.cc`) —
here compressed into one generative comparison against a leaf-level
oracle with the engine's NULL semantics: a NULL fails every predicate
except IS NULL; NOT_* leaf forms exclude NULLs; logical NOT is a plain
mask complement (so `NOT x > 5` INCLUDES null rows).
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
    InvertIndexParam,
    MetricType,
    VectorQuery,
    VectorSchema,
)

N = 160  # docs per state (sealed + writing)
CATS = ["tag0", "tag12", "alpha", "alphabet", "beta", "tag9x"]
TOKENS = ["a", "b", "c", "dd", "ee"]


def _make_docs(rng, n, start, dim):
    docs, rows = [], []
    for i in range(start, start + n):
        row = {
            "cat": rng.choice(CATS) if rng.random() > 0.15 else None,
            "price": float(rng.integers(0, 50)) if rng.random() > 0.15 else None,
            "stock": int(rng.integers(-5, 20)) if rng.random() > 0.15 else None,
            "active": bool(rng.random() > 0.5) if rng.random() > 0.15 else None,
            "tags": (
                list(rng.choice(TOKENS, size=rng.integers(0, 4), replace=False))
                if rng.random() > 0.2
                else None
            ),
        }
        rows.append(row)
        docs.append(
            Doc(
                id=str(i),
                fields={k: v for k, v in row.items()},
                vectors={"v": rng.standard_normal(dim).astype(np.float32)},
            )
        )
    return docs, rows


# ---- expression generator: returns (text, oracle_fn(row) -> bool) ----


def _leaf(rng):
    kind = rng.choice(
        ["num_cmp", "cat_cmp", "like", "affix", "in", "null", "bool",
         "contain", "arrlen"]
    )
    if kind == "num_cmp":
        field = str(rng.choice(["price", "stock"]))
        op = str(rng.choice(["=", "!=", "<", "<=", ">", ">="]))
        c = int(rng.integers(-2, 30))
        import operator

        f = {"=": operator.eq, "!=": operator.ne, "<": operator.lt,
             "<=": operator.le, ">": operator.gt, ">=": operator.ge}[op]
        return f"{field} {op} {c}", lambda r: r[field] is not None and f(r[field], c)
    if kind == "cat_cmp":
        c = str(rng.choice(CATS))
        op = str(rng.choice(["=", "!="]))
        if op == "=":
            return f"cat = '{c}'", lambda r: r["cat"] is not None and r["cat"] == c
        return f"cat != '{c}'", lambda r: r["cat"] is not None and r["cat"] != c
    if kind == "like":
        pat = str(rng.choice(["tag%", "%bet", "alp_a", "%a%", "tag_%"]))
        import re

        rx = re.compile(
            "^" + re.escape(pat).replace("%", ".*").replace("_", ".") + "$"
        )
        neg = rng.random() < 0.3
        text = f"cat {'NOT ' if neg else ''}LIKE '{pat}'"

        def f(r, rx=rx, neg=neg):
            hit = r["cat"] is not None and rx.match(r["cat"]) is not None
            return (not hit and r["cat"] is not None) if neg else hit

        return text, f
    if kind == "affix":
        op = str(rng.choice(["HAS_PREFIX", "HAS_SUFFIX"]))
        c = str(rng.choice(["tag", "al", "bet", "x", "9x"]))
        neg = rng.random() < 0.3
        text = f"cat {'NOT ' if neg else ''}{op} '{c}'"

        def f(r, op=op, c=c, neg=neg):
            if r["cat"] is None:
                return False
            hit = r["cat"].startswith(c) if op == "HAS_PREFIX" else r["cat"].endswith(c)
            return not hit if neg else hit

        return text, f
    if kind == "in":
        vals = list(rng.choice(CATS, size=2, replace=False))
        neg = rng.random() < 0.3
        text = f"cat {'NOT ' if neg else ''}IN ('{vals[0]}', '{vals[1]}')"

        def f(r, vals=tuple(vals), neg=neg):
            if r["cat"] is None:
                return False
            hit = r["cat"] in vals
            return not hit if neg else hit

        return text, f
    if kind == "null":
        field = str(rng.choice(["cat", "price", "tags", "active"]))
        if rng.random() < 0.5:
            return f"{field} IS NULL", lambda r: r[field] is None
        return f"{field} IS NOT NULL", lambda r: r[field] is not None
    if kind == "bool":
        want = bool(rng.random() < 0.5)
        return (
            f"active = {'TRUE' if want else 'FALSE'}",
            lambda r: r["active"] is not None and r["active"] == want,
        )
    if kind == "contain":
        op = str(rng.choice(["CONTAIN_ALL", "CONTAIN_ANY"]))
        vals = list(rng.choice(TOKENS, size=2, replace=False))
        neg = rng.random() < 0.3
        text = f"tags {'NOT ' if neg else ''}{op} ('{vals[0]}', '{vals[1]}')"

        def f(r, op=op, vals=tuple(vals), neg=neg):
            if r["tags"] is None:
                return False
            s = set(r["tags"])
            hit = all(x in s for x in vals) if op == "CONTAIN_ALL" else any(
                x in s for x in vals
            )
            return not hit if neg else hit

        return text, f
    # arrlen
    op = str(rng.choice(["=", ">=", "<"]))
    c = int(rng.integers(0, 4))
    import operator

    fop = {"=": operator.eq, ">=": operator.ge, "<": operator.lt}[op]
    return (
        f"array_length(tags) {op} {c}",
        lambda r: r["tags"] is not None and fop(len(r["tags"]), c),
    )


def _expr(rng, depth=0):
    roll = rng.random()
    if depth >= 2 or roll < 0.45:
        return _leaf(rng)
    if roll < 0.65:
        lt, lf = _expr(rng, depth + 1)
        rt, rf = _expr(rng, depth + 1)
        return f"({lt}) AND ({rt})", lambda r: lf(r) and rf(r)
    if roll < 0.85:
        lt, lf = _expr(rng, depth + 1)
        rt, rf = _expr(rng, depth + 1)
        return f"({lt}) OR ({rt})", lambda r: lf(r) or rf(r)
    ct, cf = _expr(rng, depth + 1)
    return f"NOT ({ct})", lambda r: not cf(r)


@pytest.mark.parametrize("invert_indexed", [False, True])
def test_filter_fuzz_vs_oracle(tmp_path, rng, invert_indexed):
    dim = 8
    fields = [
        FieldSchema("cat", DataType.STRING, nullable=True,
                    index_param=InvertIndexParam() if invert_indexed else None),
        FieldSchema("price", DataType.DOUBLE, nullable=True,
                    index_param=InvertIndexParam() if invert_indexed else None),
        FieldSchema("stock", DataType.INT64, nullable=True),
        FieldSchema("active", DataType.BOOL, nullable=True),
        FieldSchema("tags", DataType.ARRAY_STRING, nullable=True),
    ]
    schema = CollectionSchema("col_fz",
        fields=fields,
        vectors=[VectorSchema("v", DataType.VECTOR_FP32, dim,
                              FlatIndexParam(MetricType.L2))],
    )
    c = zvec_tpu.create_and_open(str(tmp_path / f"fz{invert_indexed}"), schema)
    docs1, rows1 = _make_docs(rng, N, 0, dim)
    c.insert(docs1)
    c.optimize()  # seal -> Arrow fast path + inverted index serve these rows
    docs2, rows2 = _make_docs(rng, N, N, dim)
    c.insert(docs2)  # writing segment -> Python eval path
    rows = rows1 + rows2

    q = np.zeros(dim, np.float32)
    for trial in range(40):
        text, oracle = _expr(rng)
        expect = {str(i) for i, r in enumerate(rows) if oracle(r)}
        got = {
            d.id
            for d in c.query(
                VectorQuery("v", vector=q), topk=2 * N, filter=text,
                output_fields=[],
            )
        }
        assert got == expect, (
            f"filter mismatch (trial {trial}, inverted={invert_indexed}):\n"
            f"  {text}\n  missing={sorted(expect - got)[:10]}"
            f" extra={sorted(got - expect)[:10]}"
        )
