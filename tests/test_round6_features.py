"""Round-6 optimization pins: the literal-centroid IVF assignment and
the id-partitioned shingle layout changed operator INTERNALS — these
tests pin the documented equivalences the optimizations rely on."""

import math
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from pcgraph.datapipe.dedup import minhash_signatures, word_shingles
from pcgraph.datapipe.similarity import (
    _nearest_buckets,
    _python_norm,
    _norm,
)


def _round6(x: float) -> float:
    # Spark's round() is HALF_UP on the decimal representation (Python's
    # built-in round is banker's) — mirror Spark for the reference.
    if math.isnan(x):
        return x
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _ref_assign(vec, centroids, n_probe):
    """Independent reference of the documented assignment semantics:
    ccos = round(cos, 6) desc, bucket asc, NaN larger than everything."""
    vn = math.sqrt(sum(x * x for x in vec))
    scored = []
    for b, c in enumerate(centroids):
        cn = math.sqrt(sum(x * x for x in c))
        denom = vn * cn
        dot = sum(x * y for x, y in zip(vec, c))
        cos = dot / denom if denom != 0.0 else float("nan")
        scored.append((b, _round6(cos)))
    key = lambda bc: (
        not math.isnan(bc[1]),  # NaN sorts before (i.e. larger than) numbers
        -bc[1] if not math.isnan(bc[1]) else 0.0,
        bc[0],
    )
    return [b for b, _ in sorted(scored, key=key)][:n_probe]


def test_literal_centroid_assignment_matches_reference(spark):
    """The map-only literal-centroid argmax (array_max / sort_array over
    the scored struct array) must reproduce the documented ordering on
    the awkward cases: exact centroid ties (duplicate centroids), and
    all-NaN cosines (NaN component; a zero vector raises DIVIDE_BY_ZERO
    under ANSI mode in the old and new formulations alike, so it is not
    a supported input)."""
    centroids = [
        [1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
        [1.0, 0.0, 0.0],  # duplicate of bucket 0 -> exact ccos tie
        [0.5, 0.5, 0.0],
    ]
    rows = [
        (0, [2.0, 0.0, 0.0]),   # ties buckets 0 and 2 -> smaller wins
        (1, [0.0, 3.0, 0.0]),
        (2, [float("nan"), 0.0, 0.0]),  # every ccos NaN -> bucket 0
        (3, [1.0, 1.0, 0.0]),   # bucket 3 exactly, 0/1/2 tie behind
        (4, [-1.0, -1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, schema="vec_id long, v array<double>")

    one = {
        r["vec_id"]: r["bucket"]
        for r in _nearest_buckets(df, centroids, 1, "vec_id", "v").collect()
    }
    for vid, vec in rows:
        assert one[vid] == _ref_assign(vec, centroids, 1)[0], vid

    two = (
        _nearest_buckets(df, centroids, 2, "vec_id", "v")
        .groupBy("vec_id")
        .agg(F.collect_list("bucket").alias("bs"))
        .collect()
    )
    got = {r["vec_id"]: sorted(r["bs"]) for r in two}
    for vid, vec in rows:
        assert got[vid] == sorted(_ref_assign(vec, centroids, 2)), vid


def test_python_norm_mirrors_spark_fold(spark):
    """_python_norm must be bit-identical to the Spark-side _norm fold
    (same left-to-right IEEE binary64 summation): the literal centroid
    norms replace what the old plan computed in the JVM."""
    import random

    random.seed(7)
    vecs = [
        [random.uniform(-1e3, 1e3) for _ in range(64)],
        [1e-300, 1e300, -1e300, 2.5e-7],
        [0.0, -0.0, 3.141592653589793],
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], schema="i long, v array<double>"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select("i", _norm(F.col("v")).alias("n")).collect()
    }
    for i, v in enumerate(vecs):
        expected = _python_norm(v)
        assert got[i] == expected or (
            math.isinf(expected) and math.isinf(got[i])
        ), (i, got[i], expected)


def test_shingle_layout_keeps_signatures_exchange_free(spark):
    """word_shingles partitions by id before the explode; the signature
    groupBy(id) must then plan WITHOUT its own exchange (the optimization
    that deduplicates the band self-join's two signature subtrees), and
    the shingle set itself must equal a naive recompute."""
    rows = [(i, f"w{i % 3} x y z a b c token{i}") for i in range(40)]
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")

    sh = word_shingles(docs)
    naive = (
        docs.select(
            F.col("doc_id").alias("id"),
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(1), F.size(F.split("text", " ")) - 2
                    ),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.split("text", " "), i, 3)
                    ),
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    assert sorted(map(tuple, sh.collect())) == sorted(
        map(tuple, naive.collect())
    )

    plan = (
        minhash_signatures(sh)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one exchange: the pre-explode repartition by id; the
    # distinct and the signature aggregation reuse its partitioning
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_ivf_search_broadcasts_probe_side_and_skips_distinct(spark):
    """The candidate join must build from the (hinted) probe side —
    never shuffle the corpus — and plan no aggregation-based dedup of
    the scored candidates (each (query, neighbor) pair is scored at
    most once by construction)."""
    from pcgraph.datapipe.similarity import cosine_topk_ivf

    rows = [(i, [float(i % 7 + 1), float(i % 5 + 1), 1.0]) for i in range(60)]
    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<double>")
    out = cosine_topk_ivf(
        df, df.filter(F.col("vec_id") < 3), k=2, n_centroids=4, iters=1,
        n_probe=2,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_double_literal_sql_nonfinite_and_roundtrip(spark):
    """Literal rendering must round-trip finite doubles bit-exactly and
    produce parseable SQL for inf/NaN (a degenerate corpus can push a
    centroid component there; the old DataFrame path computed through
    them)."""
    import struct as _struct

    from pcgraph.datapipe.similarity import _double_literal_sql

    vals = [1.5, -0.0, 1e-300, 2.5e-7, 3.141592653589793,
            float("inf"), float("-inf"), float("nan")]
    exprs = ", ".join(_double_literal_sql(v) for v in vals)
    row = spark.range(1).selectExpr(f"array({exprs}) as a").collect()[0]["a"]
    for got, want in zip(row, vals):
        if math.isnan(want):
            assert math.isnan(got)
        else:
            assert _struct.pack("<d", got) == _struct.pack("<d", want), (got, want)
