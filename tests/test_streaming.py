"""Structured Streaming path (SURVEY.md ST1): incremental extraction with
exactly-once file-source checkpointing + windowed event aggregation."""

import os

from pyspark.sql import functions as F

from document_ai_spark.sources.pages import write_pages_parquet
from document_ai_spark.streaming.incremental import (
    incremental_extract,
    run_windowed_stream,
    windowed_event_counts,
)
from tests.conftest import SF_TINY


def test_incremental_extract_picks_up_new_files_once(spark, tmp_path):
    pages = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    write_pages_parquet(pages, 60, seed=42)
    incremental_extract(spark, pages, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 == 60

    # no new files -> second trigger adds nothing (exactly-once)
    incremental_extract(spark, pages, out, ckpt)
    assert spark.read.parquet(out).count() == 60

    # drop new page files in (webhook-arrival analog) -> only delta processed
    write_pages_parquet(os.path.join(pages, "late"), 25, seed=99)
    incremental_extract(spark, pages, out, ckpt)
    df = spark.read.parquet(out)
    assert df.count() == 85  # 60 + 25, each file processed exactly once

    # third trigger with nothing new: still 85 (idempotent)
    incremental_extract(spark, pages, out, ckpt)
    assert spark.read.parquet(out).count() == 85


def test_windowed_stream_matches_batch(spark, tmp_path):
    # streaming file source requires a directory; stage the fixture file
    events_dir = tmp_path / "events"
    events_dir.mkdir()
    import shutil

    shutil.copy(f"{SF_TINY}/events.parquet", events_dir / "part-0.parquet")
    streamed = run_windowed_stream(spark, str(events_dir), str(tmp_path / "sck"), "evt_test")
    batch = windowed_event_counts(spark.read.parquet(str(events_dir)))
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b and len(s) > 0
