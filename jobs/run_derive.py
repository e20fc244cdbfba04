"""spark-submit entry: derive the link graph from a source-code table.

Usage:
  spark-submit --py-files pcgraph.zip jobs/run_derive.py \
      --source <parquet (repo,path,commit,lang,content)> \
      --out <edges parquet> [--level file|repo|cooccurrence] \
      [--verify-sha]
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--level", default="file", choices=["file", "repo", "cooccurrence"]
    )
    ap.add_argument("--verify-sha", action="store_true")
    args = ap.parse_args()

    from pcgraph import derive

    spark = SparkSession.builder.appName("pcgraph-derive").getOrCreate()
    source = spark.read.parquet(args.source)
    if args.level == "cooccurrence":
        edges = derive.cooccurrence_edges(source)
    else:
        edges = derive.dependency_edges(source, level=args.level)
    edges.write.mode("overwrite").parquet(args.out)
    stats = {"algorithm": f"derive_{args.level}", "n_edges": spark.read.parquet(args.out).count()}
    if args.verify_sha:
        mismatches = derive.verify_content_sha(source, derive.file_catalog(source))
        stats["content_sha_mismatches"] = mismatches
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
