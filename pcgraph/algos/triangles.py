"""Triangle counting — pure DataFrame two-hop join (Catalyst-optimized).

Mandated by the north rule (no reference counterpart).  Undirected
semantics, each triangle counted exactly once via canonical orientation:
symmetrize, keep ``src < dst``, then

    e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c)   with a < b < c

This is the standard published approach; no pandas UDF needed — the
three-way equi-join stays entirely JVM-side (sort-merge/shuffled hash,
AQE re-plans at runtime), so it scales with the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_edges(edges: DataFrame) -> DataFrame:
    """Undirected edge set, one row per edge, oriented src < dst."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    return (
        e.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
    )


def triangle_count(edges: DataFrame) -> int:
    """Total number of distinct triangles in the undirected graph."""
    return int(triangles_df(edges).agg(F.count("*").alias("n")).collect()[0]["n"])


def triangles_df(edges: DataFrame) -> DataFrame:
    """DataFrame[a, b, c] of distinct triangles with a < b < c."""
    canon = canonical_edges(edges)
    e1 = canon.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = canon.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = canon.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")


def triangle_count_per_vertex(edges: DataFrame) -> DataFrame:
    """DataFrame[id, triangles]: number of triangles incident to each vertex."""
    t = triangles_df(edges)
    stacked = (
        t.select(F.col("a").alias("id"))
        .union(t.select(F.col("b").alias("id")))
        .union(t.select(F.col("c").alias("id")))
    )
    return stacked.groupBy("id").agg(F.count("*").alias("triangles"))
