"""Dump .explain("formatted") plans for the r06-touched queries.

Usage: python scripts/dump_plans_r06.py <repo_root> <out_dir> <suffix>

Run once with the round-start checkout (suffix=before) and once with
the final tree (suffix=after); the engine round plans are captured by
intercepting the STEADY round's (last superstep's) localCheckpoint —
round 2+, whose state side inherits the previous checkpoint's
partitioning/ordering.
"""

from __future__ import annotations

import os
import sys

repo, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo)
os.makedirs(out_dir, exist_ok=True)

from pcgraph.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = get_spark(app_name=f"plans-{suffix}", cores=32, shuffle_partitions=32)
sf_dir = "/root/testdata/sf0.1"


def write(name, df_or_text):
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    if isinstance(df_or_text, str):
        text = df_or_text
    else:
        text = df_or_text._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    with open(path, "w") as fh:
        fh.write(text)
    print("wrote", path)


# ---- engine round plans: capture the steady round's merge checkpoint
from pyspark.sql.classic.dataframe import DataFrame as CDF  # noqa: E402

_orig_ckpt = CDF.localCheckpoint
_captured: list[str] = []


def _capture(self, eager=True, storageLevel=None):
    try:
        _captured.append(
            self._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
    except Exception as exc:  # noqa: BLE001
        _captured.append(f"<capture failed: {exc}>")
    if storageLevel is None:
        return _orig_ckpt(self, eager=eager)
    return _orig_ckpt(self, eager=eager, storageLevel=storageLevel)


edges = spark.read.parquet("/tmp/pcgraph_bench_edges.parquet")
n_edges = edges.count()
store_root = "/tmp/pcgraph_bench_store_sf0.1"

from pcgraph.partition import ensure_block_store  # noqa: E402
from pcgraph.algos.cc import connected_components, symmetrize  # noqa: E402
from pcgraph.algos.labelprop import label_propagation  # noqa: E402
from pcgraph.algos.pagerank import pagerank  # noqa: E402
from pcgraph.algos.sssp import sssp  # noqa: E402

blocks_pr = ensure_block_store(
    spark, edges, 32, os.path.join(store_root, "directed"), tag="directed",
    expected_edges=n_edges,
)
blocks_sym = ensure_block_store(
    spark, symmetrize(edges), 32, os.path.join(store_root, "sym"), tag="sym"
)
blocks_w = ensure_block_store(
    spark, edges, 32, os.path.join(store_root, "directed-w"), weighted=True,
    tag="directed-w", expected_edges=n_edges,
)

for name, fn in (
    (
        "pagerank_round",
        lambda: pagerank(
            spark, edges, tol=1e-6, max_iter=2, num_partitions=32,
            blocks=blocks_pr,
        ),
    ),
    (
        "cc_round",
        lambda: connected_components(
            spark, edges, num_partitions=32, max_iter=2, blocks=blocks_sym
        ),
    ),
    (
        "sssp_round",
        lambda: sssp(
            spark, edges, source=int(edges.agg(F.min("src")).collect()[0][0]),
            num_partitions=32, max_iter=2, blocks=blocks_w,
        ),
    ),
    (
        "label_prop_round",
        lambda: label_propagation(
            spark, edges, max_iter=3, num_partitions=32, blocks=blocks_sym
        ),
    ),
):
    _captured.clear()
    CDF.localCheckpoint = _capture
    try:
        fn()
    finally:
        CDF.localCheckpoint = _orig_ckpt
    # last capture = the final round's merge (round 2+: the STEADY
    # shape, state side inheriting the previous checkpoint's partitioning)
    # (label_prop's round 1 is the JVM min-fold outside the engine, so
    # its LAST capture is the first engine round)
    plan = _captured[-1] if _captured else "<no checkpoint captured>"
    write(name, plan)

# ---- plain query plans
from pcgraph.algos.triangles import triangles_df  # noqa: E402
from pcgraph.datapipe.dedup import near_duplicates  # noqa: E402
from pcgraph.datapipe.similarity import (  # noqa: E402
    cosine_topk_bruteforce,
    cosine_topk_ivf,
)
from pcgraph import derive  # noqa: E402

docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
source = spark.read.parquet("/tmp/pcgraph_bench_source_sf0.1.parquet")

write("triangles", triangles_df(symmetrize(edges)))
write("minhash_near_duplicates", near_duplicates(docs, threshold=0.2))
write(
    "knn_bruteforce",
    cosine_topk_bruteforce(emb, emb.filter(F.col("vec_id") < 20), k=3),
)
write(
    "knn_ivf",
    cosine_topk_ivf(
        emb, emb.filter(F.col("vec_id") < 20), k=3, n_centroids=8, iters=2,
        n_probe=2,
    ),
)
write("derive", derive.dependency_edges(source, level="file"))

spark.stop()
