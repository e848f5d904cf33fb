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


def _iceberg_cat(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    cat.iceberg = "ice"  # no jars in sandbox: drive the branch via mocks
    return cat


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """The co-location contract: two tables bucketed identically on the
    join key sort-merge-join with NO Exchange on either side — the scale
    property that lets repeated doc_hash joins skip re-shuffling the fact
    table. Broadcast is disabled for the assertion so the planner cannot
    sidestep the bucketed SMJ."""
    cat = Catalog(spark, str(tmp_path), namespace="buckt")
    facts = spark.range(0, 2000).selectExpr(
        "cast(id as string) as doc_hash", "id as n_chars"
    )
    dims = spark.range(0, 500).selectExpr(
        "cast(id as string) as doc_hash", "id * 2 as score"
    )
    try:
        cat.write_bucketed(facts, "facts", ["doc_hash"], num_buckets=8)
        cat.write_bucketed(dims, "dims", ["doc_hash"], num_buckets=8)
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = cat.read_bucketed("facts").join(
                cat.read_bucketed("dims"), "doc_hash"
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # bucketing co-locates both sides
            assert joined.count() == 500
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        for t in ("buckt_facts", "buckt_dims"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_write_rejects_append_and_drop_cleans_catalog(spark, tmp_path):
    import pytest

    cat = Catalog(spark, str(tmp_path), namespace="bk2")
    df = spark.range(0, 50).selectExpr("cast(id as string) as doc_hash", "id as v")
    try:
        # parquet fallback is overwrite-only (saveAsTable bucketing
        # metadata cannot be appended to safely) — the mode param must
        # not pretend otherwise
        with pytest.raises(ValueError, match="overwrite-only"):
            cat.write_bucketed(df, "t", ["doc_hash"], num_buckets=4, mode="append")
        cat.write_bucketed(df, "t", ["doc_hash"], num_buckets=4)
        assert cat.read_bucketed("t").count() == 50
        # drop() must remove the session-catalog entry too, not just files
        cat.drop("t")
        assert not spark.catalog.tableExists("bk2_t")
    finally:
        spark.sql("DROP TABLE IF EXISTS bk2_t")


def test_iceberg_identifier_resolution(spark, tmp_path):
    cat = _iceberg_cat(spark, tmp_path)
    assert cat.identifier("pages") == "ice.db.pages"
    assert Catalog(spark, str(tmp_path), namespace="raw").identifier("t").endswith("/t")


def test_iceberg_append_bootstraps_with_df_schema(spark, tmp_path):
    """Regression (round-2 ADVICE): first append must writeTo().create()
    from the df's own schema — a dummy CTAS would make a 1-int-column table
    and every later append would fail on schema mismatch."""
    from unittest.mock import MagicMock

    cat = _iceberg_cat(spark, tmp_path)
    cat.spark = MagicMock()
    df = MagicMock()

    # table absent -> create() (schema from df), never append(), no SQL CTAS
    cat.spark.catalog.tableExists.return_value = False
    cat.append(df, "pages")
    df.writeTo.assert_called_once_with("ice.db.pages")
    df.writeTo.return_value.create.assert_called_once_with()
    df.writeTo.return_value.append.assert_not_called()
    cat.spark.sql.assert_not_called()

    # table present -> append()
    df.reset_mock()
    cat.spark.catalog.tableExists.return_value = True
    cat.append(df, "pages")
    df.writeTo.return_value.append.assert_called_once_with()
    df.writeTo.return_value.create.assert_not_called()


def test_iceberg_write_day_partitioned_uses_writer_v2(spark, tmp_path):
    from unittest.mock import MagicMock, patch

    cat = _iceberg_cat(spark, tmp_path)
    cat.spark = MagicMock()
    df = MagicMock()
    w = df.writeTo.return_value.partitionedBy.return_value

    with patch("document_ai_spark.sources.catalog.F.days") as days:
        cat.write_day_partitioned(df, "pages", mode="overwrite")
    df.writeTo.assert_called_once_with("ice.db.pages")
    df.writeTo.return_value.partitionedBy.assert_called_once_with(days.return_value)
    w.createOrReplace.assert_called_once_with()

    df.reset_mock()
    cat.spark.catalog.tableExists.return_value = True
    with patch("document_ai_spark.sources.catalog.F.days"):
        cat.write_day_partitioned(df, "pages", mode="append")
    df.writeTo.return_value.partitionedBy.return_value.append.assert_called_once_with()


def test_iceberg_drop_issues_drop_table(spark, tmp_path):
    from unittest.mock import MagicMock

    cat = _iceberg_cat(spark, tmp_path)
    cat.spark = MagicMock()
    cat.drop("pages")
    cat.spark.sql.assert_called_once_with("DROP TABLE IF EXISTS ice.db.pages")


def test_iceberg_bucketed_write_transforms_every_bucket_column(spark, tmp_path):
    """Regression (round-3 ADVICE): the Iceberg branch used to apply
    bucket(N, col) to bucket_cols[0] ONLY, silently dropping the rest of a
    multi-column spec — the co-location contract then held for one column
    while the Parquet fallback bucketed on all of them."""
    from unittest.mock import MagicMock, call, patch

    cat = _iceberg_cat(spark, tmp_path)
    cat.spark = MagicMock()
    df = MagicMock()

    with patch("document_ai_spark.sources.catalog.F.bucket") as bucket:
        cat.write_bucketed(df, "t", ["doc_hash", "warc_day"], num_buckets=8)
    assert bucket.call_count == 2
    cols = [c.args[1] for c in bucket.call_args_list]
    assert [c.args[0] for c in bucket.call_args_list] == [8, 8]
    df.writeTo.return_value.partitionedBy.assert_called_once_with(
        bucket.return_value, bucket.return_value
    )
    df.writeTo.return_value.partitionedBy.return_value.createOrReplace.assert_called_once_with()
