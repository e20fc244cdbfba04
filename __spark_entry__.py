"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Graph queries derive deterministic link graphs from the TPC-H-ish
tables (part->supplier dependency edges, supplier co-occurrence edges,
nation co-trade edges) and run the pcgraph partition-centric engine on
them; the DuckDB oracles re-express the same semantics in ANSI SQL
(fixed-iteration unrolling for PageRank/LP, recursive CTE for CC).
Data-pipeline queries (dedup, minhash, jaccard, knn, text stats) run on
the documents/embeddings tables with engine-portable hashing (sha256).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DAMPING = 0.85
PR_ITERS = 5
LP_ITERS = 2
SUPP_OFFSET = 1000000


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------- graphs
def _supplier_cooccurrence_edges(spark, sf_dir) -> DataFrame:
    """Directed-symmetric supplier co-occurrence: suppliers sharing a part."""
    ps = _read(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    a = ps.select("l_partkey", F.col("l_suppkey").alias("src"))
    b = ps.select("l_partkey", F.col("l_suppkey").alias("dst"))
    return (
        a.join(b, "l_partkey")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


_COOC_SQL = """
ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
e AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM ps a JOIN ps b USING (l_partkey)
      WHERE a.l_suppkey <> b.l_suppkey)
"""

_SHINGLE_SQL = """
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents),
sh AS (SELECT DISTINCT a.doc_id AS id, a.t || ' ' || b.t || ' ' || c.t AS shingle
       FROM tok a
       JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
       JOIN tok c ON c.doc_id = a.doc_id AND c.i = a.i + 2
       UNION
       SELECT doc_id AS id, text AS shingle FROM documents
       WHERE len(string_split(text, ' ')) < 3),
sigs AS (SELECT id,
                min(sha256('s0|' || shingle)) AS sig0,
                min(sha256('s1|' || shingle)) AS sig1,
                min(sha256('s2|' || shingle)) AS sig2,
                min(sha256('s3|' || shingle)) AS sig3
         FROM sh GROUP BY id)
"""


def _pagerank_sql() -> str:
    body = f"""WITH {_COOC_SQL},
verts AS (SELECT s_suppkey AS id FROM supplier),
deg AS (SELECT src AS id, count(*)::DOUBLE AS deg FROM e GROUP BY 1),
nn AS (SELECT count(*)::DOUBLE AS n FROM supplier),
pr0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS pr FROM verts)"""
    for k in range(1, PR_ITERS + 1):
        body += f""",
msg{k} AS (SELECT e.dst AS id, sum(p.pr / dg.deg) AS s
           FROM pr{k-1} p JOIN deg dg ON dg.id = p.id
           JOIN e ON e.src = p.id GROUP BY 1),
dang{k} AS (SELECT COALESCE(sum(p.pr), 0.0) AS d
            FROM pr{k-1} p LEFT JOIN deg dg ON dg.id = p.id
            WHERE dg.id IS NULL),
pr{k} AS (SELECT v.id,
                 (1 - {DAMPING}) / (SELECT n FROM nn)
                 + {DAMPING} * (COALESCE(m.s, 0.0)
                                + (SELECT d FROM dang{k}) / (SELECT n FROM nn)) AS pr
          FROM verts v LEFT JOIN msg{k} m ON m.id = v.id)"""
    body += f"\nSELECT id, round(pr, 9) AS pr FROM pr{PR_ITERS}"
    return body


def _labelprop_sql() -> str:
    body = f"""WITH {_COOC_SQL},
verts AS (SELECT s_suppkey AS id FROM supplier),
lab0 AS (SELECT id, id AS label FROM verts)"""
    for k in range(1, LP_ITERS + 1):
        body += f""",
cnt{k} AS (SELECT e.dst AS id, l.label, count(*) AS c
           FROM lab{k-1} l JOIN e ON e.src = l.id GROUP BY 1, 2),
pick{k} AS (SELECT id, label FROM (
              SELECT id, label,
                     row_number() OVER (PARTITION BY id
                                        ORDER BY c DESC, label ASC) AS rn
              FROM cnt{k}) WHERE rn = 1),
lab{k} AS (SELECT v.id, COALESCE(p.label, l.label) AS label
           FROM verts v
           JOIN lab{k-1} l ON l.id = v.id
           LEFT JOIN pick{k} p ON p.id = v.id)"""
    body += f"\nSELECT id, label FROM lab{LP_ITERS}"
    return body


# ---------------------------------------------------------------- queries
def q_derive_edges(spark, sf_dir):
    return (
        _read(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .agg(F.count("*").alias("weight"))
    )


def q_symmetrize(spark, sf_dir):
    from pcgraph.algos.cc import symmetrize

    e = (
        _read(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("src"),
            (F.col("l_suppkey") + SUPP_OFFSET).alias("dst"),
        )
        .distinct()
    )
    return symmetrize(e)


def q_degrees(spark, sf_dir):
    from pcgraph.partition import degrees

    e = (
        _read(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("src"),
            (F.col("l_suppkey") + SUPP_OFFSET).alias("dst"),
        )
        .distinct()
    )
    return degrees(e)


def q_top_degree(spark, sf_dir):
    return (
        q_degrees(spark, sf_dir)
        .orderBy(F.col("out_deg").desc(), F.col("id").asc())
        .limit(10)
    )


def q_cc_nations(spark, sf_dir):
    from pcgraph.algos.cc import connected_components

    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    supp = _read(spark, sf_dir, "supplier")
    nation = _read(spark, sf_dir, "nation")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .select(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    result, _ = connected_components(
        spark,
        edges,
        vertices=nation.select(F.col("n_nationkey").alias("id")),
        num_partitions=4,
    )
    return result


def q_pagerank(spark, sf_dir):
    from pcgraph.algos.pagerank import pagerank

    edges = _supplier_cooccurrence_edges(spark, sf_dir)
    supp = _read(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("id"))
    result, _ = pagerank(
        spark,
        edges,
        vertices=supp,
        damping=DAMPING,
        tol=0.0,  # run exactly PR_ITERS rounds to mirror the unrolled SQL
        max_iter=PR_ITERS,
        num_partitions=8,
    )
    return result.select("id", F.round("pagerank", 9).alias("pr"))


def q_label_prop(spark, sf_dir):
    from pcgraph.algos.labelprop import label_propagation

    edges = _supplier_cooccurrence_edges(spark, sf_dir)
    supp = _read(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("id"))
    result, _ = label_propagation(
        spark,
        edges,
        vertices=supp,
        max_iter=LP_ITERS,
        num_partitions=8,
        directed=True,  # co-occurrence edges already contain both directions
    )
    return result


def q_triangles(spark, sf_dir):
    from pcgraph.algos.triangles import triangles_df

    edges = _supplier_cooccurrence_edges(spark, sf_dir)
    return triangles_df(edges).agg(F.count("*").alias("n_triangles"))


def q_triangles_per_vertex(spark, sf_dir):
    from pcgraph.algos.triangles import triangle_count_per_vertex

    edges = _supplier_cooccurrence_edges(spark, sf_dir)
    return triangle_count_per_vertex(edges)


def _nation_weighted_edges(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    supp = _read(spark, sf_dir, "supplier")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .select(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .withColumn(
            "weight",
            ((F.col("src") * 7 + F.col("dst") * 3) % 5 + 1).cast("double"),
        )
    )


def q_sssp_nations(spark, sf_dir):
    from pcgraph.algos.sssp import sssp

    result, _ = sssp(
        spark, _nation_weighted_edges(spark, sf_dir), source=0, num_partitions=4
    )
    return result.filter(F.col("distance") != float("inf")).select(
        "id", "distance"
    )


# Provable Bellman-Ford bound for the 25-node nation graph: any shortest
# path has <= n_vertices - 1 = 24 hops, so the unrolled oracle is exact
# regardless of data scale (an iteration-count-dependent oracle would
# silently become the wrong side of the comparison on a deeper graph).
_SSSP_ITERS = 24


def _sssp_sql() -> str:
    body = """WITH en AS (SELECT DISTINCT c.c_nationkey AS a, s.s_nationkey AS b
           FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           WHERE c.c_nationkey <> s.s_nationkey),
e AS (SELECT a AS src, b AS dst, ((a*7 + b*3) % 5 + 1)::DOUBLE AS w FROM en),
d0 AS (SELECT CAST(0 AS BIGINT) AS id, 0.0 AS dist)"""
    for k in range(1, _SSSP_ITERS + 1):
        body += f""",
d{k} AS (SELECT id, min(dist) AS dist FROM (
           SELECT id, dist FROM d{k-1}
           UNION ALL
           SELECT e.dst AS id, d.dist + e.w AS dist
           FROM d{k-1} d JOIN e ON e.src = d.id) GROUP BY id)"""
    body += f"\nSELECT id, dist AS distance FROM d{_SSSP_ITERS}"
    return body


def q_dedup_exact(spark, sf_dir):
    from pcgraph.datapipe.dedup import exact_duplicates

    return exact_duplicates(_read(spark, sf_dir, "documents"))


def q_minhash_signatures(spark, sf_dir):
    from pcgraph.datapipe.dedup import minhash_signatures, word_shingles

    return minhash_signatures(word_shingles(_read(spark, sf_dir, "documents")))


def q_lsh_candidates(spark, sf_dir):
    from pcgraph.datapipe.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )

    sigs = minhash_signatures(word_shingles(_read(spark, sf_dir, "documents")))
    return lsh_candidate_pairs(sigs)


def q_near_duplicates(spark, sf_dir):
    from pcgraph.datapipe.dedup import near_duplicates

    return near_duplicates(_read(spark, sf_dir, "documents"), threshold=0.2)


def q_simhash(spark, sf_dir):
    from pcgraph.datapipe.dedup import simhash64

    return simhash64(_read(spark, sf_dir, "documents"))


def q_token_stats(spark, sf_dir):
    from pcgraph.datapipe.textstats import token_stats

    stats = token_stats(_read(spark, sf_dir, "documents"))
    return stats.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct_tokens").cast("long").alias("n_distinct_tokens"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )


def q_quality_score(spark, sf_dir):
    from pcgraph.datapipe.textstats import quality_score

    return quality_score(_read(spark, sf_dir, "documents"))


def q_fingerprint(spark, sf_dir):
    from pcgraph.datapipe.textstats import fingerprint

    return fingerprint(_read(spark, sf_dir, "documents"))


def q_knn_bruteforce(spark, sf_dir):
    from pcgraph.datapipe.similarity import cosine_topk_bruteforce

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = cosine_topk_bruteforce(emb, queries, k=3)
    return out.withColumn("rank", F.col("rank").cast("long"))


def q_knn_ivf(spark, sf_dir):
    from pcgraph.datapipe.similarity import cosine_topk_bucketed

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = cosine_topk_bucketed(emb, queries, k=3)
    return out.withColumn("rank", F.col("rank").cast("long"))


def q_events_hourly(spark, sf_dir):
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
            "hour"
        ),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


def q_tpch_pricing(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------- contract
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: supplier co-occurrence graph at sf0.001 -> PageRank to
    L1 < 1e-6 -> ranked result."""
    from pcgraph.algos.pagerank import pagerank

    sf_dir = "/root/testdata/sf0.001"
    edges = _supplier_cooccurrence_edges(spark, sf_dir)
    supp = _read(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("id"))
    result, _ = pagerank(
        spark, edges, vertices=supp, tol=1e-6, max_iter=50, num_partitions=8
    )
    return result.orderBy(F.col("pagerank").desc(), F.col("id").asc()).limit(20)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "derive_edges": q_derive_edges,
        "symmetrize": q_symmetrize,
        "degrees": q_degrees,
        "top_degree": q_top_degree,
        "cc_nations": q_cc_nations,
        "sssp_nations": q_sssp_nations,
        "pagerank5": q_pagerank,
        "label_prop2": q_label_prop,
        "triangles": q_triangles,
        "triangles_per_vertex": q_triangles_per_vertex,
        "dedup_exact": q_dedup_exact,
        "minhash_signatures": q_minhash_signatures,
        "lsh_candidates": q_lsh_candidates,
        "near_duplicates": q_near_duplicates,
        "simhash": q_simhash,
        "token_stats": q_token_stats,
        "quality_score": q_quality_score,
        "fingerprint": q_fingerprint,
        "knn_bruteforce": q_knn_bruteforce,
        "knn_ivf": q_knn_ivf,
        "events_hourly": q_events_hourly,
        "tpch_pricing": q_tpch_pricing,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "derive_edges": (
            "SELECT l_partkey AS src, l_suppkey AS dst, count(*) AS weight "
            "FROM lineitem GROUP BY 1, 2"
        ),
        "symmetrize": f"""
            WITH e AS (SELECT DISTINCT l_partkey AS src,
                                       l_suppkey + {SUPP_OFFSET} AS dst
                       FROM lineitem)
            SELECT src, dst FROM e UNION SELECT dst, src FROM e
        """,
        "degrees": f"""
            WITH e AS (SELECT DISTINCT l_partkey AS src,
                                       l_suppkey + {SUPP_OFFSET} AS dst
                       FROM lineitem),
            o AS (SELECT src AS id, count(*) AS out_deg FROM e GROUP BY 1),
            i AS (SELECT dst AS id, count(*) AS in_deg FROM e GROUP BY 1)
            SELECT COALESCE(o.id, i.id) AS id,
                   COALESCE(out_deg, 0) AS out_deg,
                   COALESCE(in_deg, 0) AS in_deg
            FROM o FULL OUTER JOIN i ON o.id = i.id
        """,
        "top_degree": f"""
            WITH e AS (SELECT DISTINCT l_partkey AS src,
                                       l_suppkey + {SUPP_OFFSET} AS dst
                       FROM lineitem),
            o AS (SELECT src AS id, count(*) AS out_deg FROM e GROUP BY 1),
            i AS (SELECT dst AS id, count(*) AS in_deg FROM e GROUP BY 1),
            d AS (SELECT COALESCE(o.id, i.id) AS id,
                         COALESCE(out_deg, 0) AS out_deg,
                         COALESCE(in_deg, 0) AS in_deg
                  FROM o FULL OUTER JOIN i ON o.id = i.id)
            SELECT id, out_deg, in_deg FROM d
            ORDER BY out_deg DESC, id ASC LIMIT 10
        """,
        "cc_nations": """
            WITH RECURSIVE
            en AS (SELECT DISTINCT c.c_nationkey AS a, s.s_nationkey AS b
                   FROM lineitem l
                   JOIN orders o ON l.l_orderkey = o.o_orderkey
                   JOIN customer c ON o.o_custkey = c.c_custkey
                   JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   WHERE c.c_nationkey <> s.s_nationkey),
            e2 AS (SELECT a AS src, b AS dst FROM en
                   UNION SELECT b, a FROM en),
            verts AS (SELECT n_nationkey AS id FROM nation),
            reach(id, comp) AS (
                SELECT id, id FROM verts
                UNION
                SELECT e2.dst, r.comp FROM reach r JOIN e2 ON e2.src = r.id
            )
            SELECT id, min(comp) AS component FROM reach GROUP BY id
        """,
        "sssp_nations": _sssp_sql(),
        "pagerank5": _pagerank_sql(),
        "label_prop2": _labelprop_sql(),
        "triangles": f"""
            WITH {_COOC_SQL},
            ce AS (SELECT DISTINCT least(src, dst) AS src,
                                   greatest(src, dst) AS dst FROM e)
            SELECT count(*) AS n_triangles
            FROM ce e1
            JOIN ce e2 ON e2.src = e1.dst
            JOIN ce e3 ON e3.src = e1.src AND e3.dst = e2.dst
        """,
        "triangles_per_vertex": f"""
            WITH {_COOC_SQL},
            ce AS (SELECT DISTINCT least(src, dst) AS src,
                                   greatest(src, dst) AS dst FROM e),
            t AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                  FROM ce e1
                  JOIN ce e2 ON e2.src = e1.dst
                  JOIN ce e3 ON e3.src = e1.src AND e3.dst = e2.dst),
            stacked AS (SELECT a AS id FROM t UNION ALL SELECT b FROM t
                        UNION ALL SELECT c FROM t)
            SELECT id, count(*) AS triangles FROM stacked GROUP BY id
        """,
        "dedup_exact": (
            "SELECT sha256(text) AS content_sha, min(doc_id) AS canonical_id, "
            "count(*) AS n_copies FROM documents GROUP BY 1"
        ),
        "minhash_signatures": f"""
            WITH {_SHINGLE_SQL}
            SELECT id, sig0, sig1, sig2, sig3 FROM sigs
        """,
        "lsh_candidates": f"""
            WITH {_SHINGLE_SQL},
            b0 AS (SELECT id, sig0 || '|' || sig1 AS band FROM sigs),
            b1 AS (SELECT id, sig2 || '|' || sig3 AS band FROM sigs)
            SELECT a.id AS id1, b.id AS id2
            FROM b0 a JOIN b0 b ON a.band = b.band AND a.id < b.id
            UNION
            SELECT a.id, b.id
            FROM b1 a JOIN b1 b ON a.band = b.band AND a.id < b.id
        """,
        "near_duplicates": f"""
            WITH {_SHINGLE_SQL},
            b0 AS (SELECT id, sig0 || '|' || sig1 AS band FROM sigs),
            b1 AS (SELECT id, sig2 || '|' || sig3 AS band FROM sigs),
            pairs AS (
                SELECT a.id AS id1, b.id AS id2
                FROM b0 a JOIN b0 b ON a.band = b.band AND a.id < b.id
                UNION
                SELECT a.id, b.id
                FROM b1 a JOIN b1 b ON a.band = b.band AND a.id < b.id),
            sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
            inter AS (SELECT p.id1, p.id2, count(*) AS n_inter
                      FROM pairs p
                      JOIN sh s1 ON s1.id = p.id1
                      JOIN sh s2 ON s2.id = p.id2 AND s2.shingle = s1.shingle
                      GROUP BY 1, 2)
            SELECT i.id1, i.id2,
                   round(n_inter::DOUBLE / (z1.n + z2.n - n_inter), 6) AS jaccard
            FROM inter i
            JOIN sizes z1 ON z1.id = i.id1
            JOIN sizes z2 ON z2.id = i.id2
            WHERE round(n_inter::DOUBLE / (z1.n + z2.n - n_inter), 6) >= 0.2
        """,
        "token_stats": """
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
                   length(text) AS n_chars
            FROM documents
        """,
        "quality_score": """
            WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
                              length(text) AS n_chars FROM documents)
            SELECT doc_id,
                   round(len(list_filter(toks,
                         x -> x IN ('the', 'a', 'of', 'and', 'to')))::DOUBLE
                         / len(toks), 6) AS stop_ratio,
                   round(len(list_distinct(toks))::DOUBLE / len(toks), 6)
                         AS distinct_ratio,
                   round((n_chars - (len(toks) - 1))::DOUBLE / len(toks), 6)
                         AS mean_token_len,
                   (len(toks) >= 10 AND
                    len(list_distinct(toks))::DOUBLE / len(toks) >= 0.2) AS keep
            FROM t
        """,
        "fingerprint": """
            WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t,
                                generate_subscripts(string_split(text, ' '), 1) AS i
                         FROM documents),
            sh AS (SELECT a.doc_id, a.t || ' ' || b.t || ' ' || c.t AS shingle
                   FROM tok a
                   JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                   JOIN tok c ON c.doc_id = a.doc_id AND c.i = a.i + 2
                   UNION ALL
                   SELECT doc_id, text FROM documents
                   WHERE len(string_split(text, ' ')) < 3)
            SELECT doc_id, min(sha256(shingle)) AS fingerprint
            FROM sh GROUP BY doc_id
        """,
        "knn_bruteforce": """
            WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
            scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                              list_cosine_similarity(q.embedding::DOUBLE[],
                                                     c.embedding::DOUBLE[]) AS cos
                       FROM q CROSS JOIN embeddings c
                       WHERE c.vec_id <> q.vec_id)
            SELECT query_id, neighbor_id, rank FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, neighbor_id ASC) AS rank
                FROM scored) WHERE rank <= 3
        """,
        "knn_ivf": """
            WITH q AS (SELECT vec_id, embedding, label FROM embeddings
                       WHERE vec_id < 5),
            scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                              list_cosine_similarity(q.embedding::DOUBLE[],
                                                     c.embedding::DOUBLE[]) AS cos
                       FROM q JOIN embeddings c ON c.label = q.label
                       WHERE c.vec_id <> q.vec_id)
            SELECT query_id, neighbor_id, rank FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, neighbor_id ASC) AS rank
                FROM scored) WHERE rank <= 3
        """,
        "events_hourly": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   event_type, count(*) AS n, round(sum(value), 4) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "tpch_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS n
            FROM lineitem GROUP BY 1, 2
        """,
        # "simhash" intentionally omitted: xxhash64 is not available in
        # DuckDB, so the driver records the weaker rows-only check.
    }
