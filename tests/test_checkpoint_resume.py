"""Checkpoint/resume + exactly-once semantics (SURVEY.md X5, §5.4)."""

import os

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
    # corpus v10 plants exactly one deliberate error row: the /Encrypt'd
    # PDF (labeled isolation) — the rollup must count it, and only it
    assert m["n_err"] == 1 and m["bytes_in"] > 0


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


def test_day_resume_keyed_on_day_value_not_index(spark, pages_dir, tmp_path):
    """Regression (round-2 ADVICE): resume must key on the day VALUE. If a
    lexically-earlier day partition appears between runs (normal
    incremental-crawl case), index-keyed resume would silently skip the new
    day and re-run a done one."""
    import shutil

    from document_ai_spark.plans.pipeline import day_group_key, run_extraction_by_day

    days = sorted(d for d in os.listdir(pages_dir) if d.startswith("warc_day="))
    assert len(days) >= 2
    src = str(tmp_path / "pages")
    os.makedirs(src)
    # first run sees every day EXCEPT the earliest
    for d in days[1:]:
        shutil.copytree(os.path.join(pages_dir, d), os.path.join(src, d))
    out, run = str(tmp_path / "out"), str(tmp_path / "run")
    s1 = run_extraction_by_day(spark, src, out, run, concurrency=2)
    assert s1["groups_run"] == len(days) - 1

    # the earlier day arrives; ONLY it must run, everything done stays done
    shutil.copytree(os.path.join(pages_dir, days[0]), os.path.join(src, days[0]))
    s2 = run_extraction_by_day(spark, src, out, run, concurrency=2)
    assert s2["groups_run"] == 1 and s2["groups_done_before"] == len(days) - 1

    new_day = days[0].split("=", 1)[1]
    assert day_group_key(new_day) != day_group_key(days[1].split("=", 1)[1])
    # output now covers all days exactly once
    df = load_extracted(spark, out)
    assert df.count() == df.select("url").distinct().count() == 200
