"""Compose strict + salting + block-store mode at 316M edges (r3/r4
verdict task): one salted, strict, store-mode CC run whose result hash
must equal the unsalted store-mode run's.

CC (not PageRank) is the composition vehicle on purpose: the 316M
import graph's out-degrees are ~uniform (~8 imports/file) while its
IN-degrees are zipf-skewed, so salting — which splits SOURCE slices —
only has real work to do on the SYMMETRIZED graph, where the in-hubs
become out-hubs (fixtures.bench_source_df docstring).  CC runs on the
symmetrized graph and carries integer labels, so "hash equal" is exact
(PageRank's float sums are legitimately order-sensitive under a
different partitioning; its equivalence is a tolerance statement, not
a hash).  strict=True exercises the per-round missing-vertex anti-join
against the full run.

Writes BENCH/cc_strict_salted_316m_r5.json.

Usage: python scripts/bench_strict_salted_store.py \
    [--edges /tmp/pcgraph_scaling_edges.parquet] [--partitions 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def result_hash(df) -> int:
    """Order-independent exact fingerprint of (id, component) rows."""
    from pyspark.sql import functions as F

    row = df.select(
        F.sum(F.xxhash64("id", "component")).alias("h"),
        F.count("*").alias("n"),
    ).collect()[0]
    return int(row["h"]), int(row["n"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", default="/tmp/pcgraph_scaling_edges.parquet")
    ap.add_argument("--partitions", type=int, default=128)
    ap.add_argument("--max-iter", type=int, default=30)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pcgraph.algos.cc import connected_components, symmetrize
    from pcgraph.metrics import HostCpuSampler, StageMetricsSampler
    from pcgraph.session import get_spark

    spark = get_spark(app_name="cc-strict-salted-316m", cores=32,
                      shuffle_partitions=32,
                      extra_conf={"spark.ui.enabled": "true"})
    edges = spark.read.parquet(args.edges)
    n_edges = edges.count()

    # Pick the salt threshold from the measured skew: the top hub gets
    # ~16 salted slices; everything below the threshold is untouched.
    # The degree census comes from the UNSALTED store's vertices
    # sidecar (written at its build) — re-deriving it from the edge
    # table would re-run the full symmetrize-distinct shuffle whose
    # temp files then coexist on disk with the salted build's own.
    sym = symmetrize(edges)
    unsalted_store = args.edges + f".symstore{args.partitions}"
    top = (
        spark.read.parquet(os.path.join(unsalted_store, "vertices"))
        .agg(F.max("out_deg").alias("m"))
        .collect()
    )[0]["m"]
    salt_threshold = max(65536, int(top) // 16)

    sampler = StageMetricsSampler(spark)
    host = HostCpuSampler()

    def run(tag, store_dir, salt, strict):
        sampler.delta()  # reset the window
        host.delta()
        t0 = time.monotonic()
        cc, hist = connected_components(
            spark, edges, num_partitions=args.partitions,
            max_iter=args.max_iter, store_dir=store_dir,
            salt_threshold=salt, strict=strict,
        )
        h, n = result_hash(cc)
        wall = time.monotonic() - t0
        io = sampler.delta()
        io.update(host.delta())
        rep = {
            "tag": tag,
            "salt_threshold": salt,
            "strict": strict,
            "wall_sec": round(wall, 2),
            "supersteps": len(hist),
            "active_per_round": [m["active"] for m in hist],
            "round_sec": [m["round_sec"] for m in hist],
            "hash": h,
            "n_rows": n,
            "io": io,
        }
        print(f"RUN[{tag}] " + json.dumps(
            {k: rep[k] for k in ("wall_sec", "supersteps", "hash", "n_rows")}
        ), flush=True)
        return rep

    # pre-build the salted store so both runs time ONLY the iteration
    # (the one-time build is reported separately, bench.py convention)
    from pcgraph.partition import ensure_block_store

    salted_store = (
        args.edges + f".symstore{args.partitions}.salt{salt_threshold}"
    )
    t0 = time.monotonic()
    ensure_block_store(
        spark, sym, args.partitions, salted_store,
        salt_threshold=salt_threshold, tag="sym",
    )
    build_salted_sec = round(time.monotonic() - t0, 2)
    # release the build's shuffle files NOW — ContextCleaner only frees
    # them at some later driver GC, and the iteration runs below need
    # the disk headroom (the build shuffles the full 633M-row sym set)
    spark.sparkContext._jvm.System.gc()
    time.sleep(5)

    runs = [
        run("unsalted", args.edges + f".symstore{args.partitions}",
            None, False),
        run("salted+strict", salted_store, salt_threshold, True),
    ]
    out = {
        "n_edges": n_edges,
        "max_sym_out_degree": int(top),
        "salt_threshold": salt_threshold,
        "build_salted_store_sec": build_salted_sec,
        "hashes_equal": runs[0]["hash"] == runs[1]["hash"]
        and runs[0]["n_rows"] == runs[1]["n_rows"],
        "runs": runs,
    }
    path = os.path.join(REPO, "BENCH", "cc_strict_salted_316m_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("RESULT " + json.dumps({k: out[k] for k in (
        "n_edges", "max_sym_out_degree", "salt_threshold", "hashes_equal")}))
    spark.stop()


if __name__ == "__main__":
    main()
