"""Mid-scale (≈40M-edge) A/B of the r06 optimizations: PageRank supersteps
on the same generated graph + same block store, run against a given repo
checkout.  Writes one JSON line; run once with the round-start worktree
and once with HEAD.

Usage: python scripts/bench_midscale_ab_r06.py <repo_root> <label> [max_iter]
"""

from __future__ import annotations

import json
import os
import sys
import time

repo, label = sys.argv[1], sys.argv[2]
max_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 4
sys.path.insert(0, repo)

N_FILES = 5_000_000
PARTITIONS = 64
EDGES = "/tmp/pcgraph_midscale_edges.parquet"
STORE = "/tmp/pcgraph_midscale_store/directed"

from pcgraph.session import get_spark  # noqa: E402

spark = get_spark(app_name=f"midscale-{label}", cores=32, shuffle_partitions=64)

from pyspark.sql import functions as F  # noqa: E402

if not os.path.exists(os.path.join(EDGES, "_SUCCESS")):
    from pcgraph import derive, fixtures

    t0 = time.monotonic()
    source = fixtures.bench_source_df(spark, n_files=N_FILES)
    derive.dependency_edges(source, level="file").write.mode(
        "overwrite"
    ).parquet(EDGES)
    print(f"generated edges in {time.monotonic() - t0:.1f}s", file=sys.stderr)

edges = spark.read.parquet(EDGES)
n_edges = edges.count()

from pcgraph.partition import ensure_block_store  # noqa: E402

t0 = time.monotonic()
blocks = ensure_block_store(
    spark, edges, PARTITIONS, STORE, tag="directed", expected_edges=n_edges
)
build_sec = round(time.monotonic() - t0, 1)

from pcgraph.algos.pagerank import pagerank  # noqa: E402

t0 = time.monotonic()
pr, hist = pagerank(
    spark, edges, tol=1e-6, max_iter=max_iter, num_partitions=PARTITIONS,
    blocks=blocks,
)
n = pr.count()
total = round(time.monotonic() - t0, 2)
print(
    json.dumps(
        {
            "label": label,
            "n_edges": n_edges,
            "partitions": PARTITIONS,
            "build_or_open_sec": build_sec,
            "pagerank_total_sec": total,
            "rounds": [round(h["round_sec"], 2) for h in hist],
            "l1_final": hist[-1]["l1"],
            "rows": n,
        }
    )
)
spark.stop()
