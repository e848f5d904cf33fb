"""Catalog adapter (SURVEY.md §7 step 0): Parquet fallback must produce the
Iceberg-identical day-partition layout; no Iceberg jars in the sandbox, so
the iceberg branch is exercised only for resolution logic."""

from __future__ import annotations

import datetime as dt
import os

from document_ai_spark.sources.catalog import Catalog, iceberg_catalog


def test_no_iceberg_catalog_in_sandbox(spark):
    assert iceberg_catalog(spark) is None


def test_parquet_fallback_layout_and_roundtrip(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    df = spark.createDataFrame(
        [
            ("u1", dt.datetime(2024, 3, 1, 10, 0), "a"),
            ("u2", dt.datetime(2024, 3, 2, 11, 0), "b"),
        ],
        "url string, warc_ts timestamp, payload string",
    )
    cat.write_day_partitioned(df, "pages_t", mode="overwrite")
    days = sorted(
        d for d in os.listdir(cat.identifier("pages_t")) if d.startswith("warc_day=")
    )
    assert days == ["warc_day=2024-03-01", "warc_day=2024-03-02"]
    back = cat.read("pages_t")
    assert back.count() == 2
    assert "warc_day" in back.columns  # partition column visible, Iceberg-style

    cat.append(df.select("url", "warc_ts", "payload"), "plain_t")
    assert cat.read("plain_t").count() == 2
    cat.drop("plain_t")
    assert not os.path.exists(cat.identifier("plain_t"))
