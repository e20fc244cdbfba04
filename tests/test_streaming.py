import os

from pyspark.sql import functions as F

from pcgraph.streaming.windows import (
    read_event_stream,
    run_batchwise,
    windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def test_windowed_counts_match_batch(spark, tmp_path):
    # file-source streams need a directory; stage the single-file table
    import shutil

    src = str(tmp_path / "events_stream")
    os.makedirs(src)
    shutil.copy(
        os.path.join(SF_DIR, "events.parquet"), os.path.join(src, "part-0.parquet")
    )
    stream = read_event_stream(spark, src, max_files_per_trigger=4)
    agg = windowed_counts(stream, window="1 hour", watermark="2 hours")
    got = run_batchwise(spark, agg, "stream_out").toPandas()

    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
        .toPandas()
    )
    # append mode only emits windows the watermark has closed; every
    # emitted window must agree exactly with the batch computation
    assert len(got) > 0
    merged = got.merge(
        batch, on=["window_start", "event_type"], suffixes=("_s", "_b")
    )
    assert len(merged) == len(got)
    assert (merged["n_s"] == merged["n_b"]).all()
    assert (abs(merged["total_value_s"] - merged["total_value_b"]) < 1e-9).all()
