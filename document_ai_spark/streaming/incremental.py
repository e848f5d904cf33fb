"""Incremental extraction via Structured Streaming (SURVEY.md ST1).

Spark re-expression of the reference's webhook path (reference
app.py:193-266: per-document arrival -> background thread -> download ->
add, at-least-once): a file-source ``readStream`` over the pages directory
with ``trigger(availableNow=True)`` and ``foreachBatch`` running the SAME
extraction stage as the batch pipeline. The streaming checkpoint upgrades
the reference's at-least-once + hash-dedup to exactly-once appends; new
page files dropped into the directory are picked up on the next trigger.

Also: windowed event aggregation (watermark + tumbling window) over the
``events`` fixture — the streaming capability the reference lacks entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from document_ai_spark.operators.extraction import extract_pages

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("warc_day", T.StringType()),
    ]
)


def incremental_extract(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    stream_checkpoint_dir: str,
    salt_partitions: int | None = None,
) -> None:
    """Process all not-yet-seen page files, append extraction output,
    then stop (availableNow). Re-running picks up only new files —
    the streaming-source analog of the batch checkpoint table."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(pages_dir)
    )

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        out = extract_pages(batch_df, salt_partitions=salt_partitions)
        out.write.mode("append").partitionBy("warc_day").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", stream_checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts per event_type with late-data watermark.
    Works identically on a batch DataFrame (window() is not
    streaming-only) — the oracle-checked entry uses the batch form."""
    src = events
    if events.isStreaming:
        # parquet infers TIMESTAMP_NTZ (Spark 4); watermarks need TIMESTAMP
        src = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
            "ts", watermark
        )
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_windowed_stream(
    spark: SparkSession, events_path: str, checkpoint_dir: str, query_name: str = "evt_counts"
) -> DataFrame:
    """Drive the windowed aggregation as a real stream over the events
    parquet (memory sink, availableNow) and return the result table."""
    schema = spark.read.parquet(events_path).schema
    stream = spark.readStream.schema(schema).parquet(events_path)
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}")
