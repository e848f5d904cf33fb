"""Checkpoint/resume + exactly-once semantics (SURVEY.md X5, §5.4)."""

import pytest
from pyspark.sql import functions as F

from document_ai_spark.plans.checkpoint import done_groups, metrics_rollup
from document_ai_spark.plans.pipeline import load_extracted, run_extraction


def test_crash_resume_exactly_once(spark, pages_dir, tmp_path):
    out, run = str(tmp_path / "out"), str(tmp_path / "run")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_extraction(spark, pages_dir, out, run, n_groups=4, fail_after_group=2)
    assert len(done_groups(spark, run)) == 2

    s = run_extraction(spark, pages_dir, out, run, n_groups=4)
    assert s["groups_done_before"] == 2 and s["groups_run"] == 2

    df = load_extracted(spark, out)
    n, nd = df.count(), df.select("url").distinct().count()
    assert n == nd == 200  # exactly-once: no dup rows from the crashed run


def test_noop_resume(spark, pages_dir, tmp_path):
    out, run = str(tmp_path / "out"), str(tmp_path / "run")
    run_extraction(spark, pages_dir, out, run, n_groups=2)
    s = run_extraction(spark, pages_dir, out, run, n_groups=2)
    assert s["groups_run"] == 0


def test_metrics_rollup_counters(spark, pages_dir, tmp_path):
    out, run = str(tmp_path / "out"), str(tmp_path / "run")
    run_extraction(spark, pages_dir, out, run, n_groups=2, run_id="r1")
    m = metrics_rollup(spark, run).filter(F.col("run_id") == "r1").collect()[0]
    assert m["n_groups"] == 2 and m["n_docs"] == 200
    assert m["n_err"] == 0 and m["bytes_in"] > 0


def test_output_partitioned_by_day(spark, pages_dir, tmp_path):
    out, run = str(tmp_path / "out"), str(tmp_path / "run")
    run_extraction(spark, pages_dir, out, run, n_groups=2)
    days = {r["warc_day"] for r in load_extracted(spark, out).select("warc_day").distinct().collect()}
    assert len(days) == 4  # generator spreads warc_ts over 4 days


def test_day_partitioned_concurrent_pipeline(spark, pages_dir, tmp_path):
    """run_extraction_by_day: partition-pruned day groups run from a thread
    pool; output must be byte-identical to the bucket-group pipeline, and
    re-running must skip all done days."""
    from document_ai_spark.plans.pipeline import (
        load_extracted,
        run_extraction,
        run_extraction_by_day,
    )

    s1 = run_extraction_by_day(
        spark, pages_dir, str(tmp_path / "day_out"), str(tmp_path / "day_run"),
        concurrency=3, files_per_day=2,
    )
    assert s1["groups_run"] > 0
    run_extraction(
        spark, pages_dir, str(tmp_path / "grp_out"), str(tmp_path / "grp_run"),
        n_groups=4, files_per_day=2,
    )

    def fp(d):
        df = load_extracted(spark, d).select("url", "doc_hash", "text", "spans")
        return sorted((r.url, r.doc_hash, r.text, str(r.spans)) for r in df.collect())

    assert fp(str(tmp_path / "day_out")) == fp(str(tmp_path / "grp_out"))

    s2 = run_extraction_by_day(
        spark, pages_dir, str(tmp_path / "day_out"), str(tmp_path / "day_run"),
        concurrency=3,
    )
    assert s2["groups_run"] == 0 and s2["groups_done_before"] == s1["groups_run"]
