"""SparkSession factory tuned for the partition-centric engine.

Local-mode defaults mirror what we would set per-executor on a real
cluster: shuffle partitions ~ cores, AQE on for the message shuffle,
Arrow on for the grouped-map (pandas) kernels.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pcgraph",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores=None`` uses ``local[*]``. ``shuffle_partitions`` defaults to
    the core count (local mode) — the 200 default is wrong at both ends.
    """
    if cores is None:
        env_cores = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(env_cores) if env_cores else os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(4, int(cores))

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("PCGRAPH_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # GC: G1 is the default — the superstep loop churns ~5-10 GB of
        # short-lived cache/Arrow buffers per round, and a measured
        # G1-vs-ParallelGC A/B on the 316M-edge loop cut total GC time
        # 8.6x (ParallelGC full collections showed 100-900s stalls at
        # 24g heaps; see docs/PERF.md).  Override with PCGRAPH_JAVA_OPTS.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "PCGRAPH_JAVA_OPTS",
                # GCLockerRetryAllocationCount: large Tungsten pages
                # (32 MB) allocated while JNI readers hold the GC locker
                # abort with "Retried waiting for GCLocker too often" at
                # the default of 2 retries — raise it (standard G1+Spark
                # mitigation).
                "-XX:+UseG1GC -XX:G1HeapRegionSize=32m"
                " -XX:+UnlockDiagnosticVMOptions"
                " -XX:GCLockerRetryAllocationCount=64",
            ),
        )
        # local-mode robustness: long stop-the-world pauses during block
        # builds must not trip the executor heartbeat (driver==executor)
        .config("spark.network.timeout", "600s")
        .config("spark.executor.heartbeatInterval", "60s")
        # Plain repartition() shuffles (no map-side combine) stream
        # straight to per-reduce-partition files below this threshold;
        # above it they buffer + sort + SPILL in the map task.  The
        # auto-sized LPA fold legitimately wants 200-512 reduce
        # partitions at 10^8-10^9 edges, and measured at 316M edges the
        # sort path spilled 10-15 GB/round in the kernel stage purely
        # because 317 > the 200 default (docs/PERF.md r5).  512 keeps
        # the per-map open-file count bounded (P_map x 512).
        .config("spark.shuffle.sort.bypassMergeThreshold", "512")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
