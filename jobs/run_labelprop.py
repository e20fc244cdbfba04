"""spark-submit entry: label propagation over an edge table.

Usage:
  spark-submit --py-files pcgraph.zip jobs/run_labelprop.py \
      --edges <parquet src,dst> --out <parquet> [--partitions P] \
      [--max-iter N] [--directed] [--salt-threshold T] \
      [--checkpoint-dir DIR] [--resume-from DIR]
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--max-iter", type=int, default=20)
    ap.add_argument("--directed", action="store_true")
    ap.add_argument("--salt-threshold", type=int, default=None)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--resume-from", default=None)
    args = ap.parse_args()

    from pcgraph.algos.labelprop import label_propagation

    spark = SparkSession.builder.appName("pcgraph-labelprop").getOrCreate()
    result, history = label_propagation(
        spark,
        spark.read.parquet(args.edges),
        max_iter=args.max_iter,
        num_partitions=args.partitions,
        directed=args.directed,
        salt_threshold=args.salt_threshold,
        checkpoint_dir=args.checkpoint_dir,
        resume_from=args.resume_from,
    )
    result.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"algorithm": "label_propagation", "rounds": history}))
    spark.stop()


if __name__ == "__main__":
    main()
