"""spark-submit entry: triangle counting over an edge table.

Usage:
  spark-submit --py-files pcgraph.zip jobs/run_triangles.py \
      --edges <parquet src,dst> --out <parquet> [--per-vertex]
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--per-vertex", action="store_true")
    args = ap.parse_args()

    from pcgraph.algos.triangles import triangle_count, triangle_count_per_vertex

    spark = SparkSession.builder.appName("pcgraph-triangles").getOrCreate()
    edges = spark.read.parquet(args.edges)
    if args.per_vertex:
        result = triangle_count_per_vertex(edges)
        result.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"algorithm": "triangles_per_vertex",
                          "rows": result.count()}))
    else:
        n = triangle_count(edges)
        spark.createDataFrame([(n,)], "n_triangles long").write.mode(
            "overwrite"
        ).parquet(args.out)
        print(json.dumps({"algorithm": "triangles", "n_triangles": n}))
    spark.stop()


if __name__ == "__main__":
    main()
