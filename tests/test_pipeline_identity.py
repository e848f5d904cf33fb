"""Spark pipeline vs committed goldens: the byte-identity gate (north rule).

The Spark extraction output must be byte-equal per url to the committed
golden files produced by the single-threaded oracle kernel — and identical
across partition layouts / salting / grouping (partition-order
independence, the local proxy for cluster-size independence).
"""

import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from document_ai_spark.operators.extraction import extract_pages
from document_ai_spark.plans.pipeline import read_pages, run_extraction, load_extracted

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def golden_index():
    with open(os.path.join(GOLDEN, "index.json")) as f:
        return json.load(f)


def _collect_texts(df):
    return {r["url"]: (r["text"] or "", r["doc_hash"]) for r in df.select("url", "text", "doc_hash").collect()}


def test_spark_output_matches_goldens(spark, pages_dir, golden_index):
    out = extract_pages(read_pages(spark, pages_dir), salt_partitions=8)
    got = _collect_texts(out)
    assert set(got) == set(golden_index)
    for url, meta in golden_index.items():
        with open(os.path.join(GOLDEN, meta["hash"] + ".txt"), "rb") as f:
            golden_bytes = f.read()
        text, doc_hash = got[url]
        assert text.encode("utf-8") == golden_bytes, f"text mismatch for {url}"
        assert doc_hash == meta["doc_hash"], f"doc_hash mismatch for {url}"


def test_spans_match_goldens(spark, pages_dir, golden_index):
    out = extract_pages(read_pages(spark, pages_dir))
    rows = out.select("url", "spans").collect()
    for r in rows:
        meta = golden_index[r["url"]]
        with open(os.path.join(GOLDEN, meta["hash"] + ".spans.json")) as f:
            golden_spans = json.load(f)
        got = [s.asDict() for s in (r["spans"] or [])]
        assert len(got) == len(golden_spans)
        for g, e in zip(got, golden_spans):
            assert g["char_start"] == e["char_start"] and g["char_end"] == e["char_end"]
            assert g["tag"] == e["tag"] and g["block_id"] == e["block_id"]
            assert abs(g["text_density"] - e["text_density"]) == 0.0
            assert abs(g["link_density"] - e["link_density"]) == 0.0


def _output_fingerprint(spark, out_dir):
    rows = (
        load_extracted(spark, out_dir)
        .select("url", "doc_hash", "text")
        .orderBy("url")
        .collect()
    )
    h = hashlib.blake2b()
    for r in rows:
        h.update(r["url"].encode())
        h.update(r["doc_hash"].encode())
        h.update((r["text"] or "").encode())
    return h.hexdigest()


def test_partition_layout_independence(spark, pages_dir, tmp_path):
    """Same input at different grouping/salting => byte-identical output.

    Local stand-in for the N vs 4N executor invariant (BASELINE.md); the
    true two-parallelism run (local[8] vs local[32]) is bench-level
    (scripts/bench_scaling.py) since one JVM owns one master setting.
    """
    run_extraction(spark, pages_dir, str(tmp_path / "a"), str(tmp_path / "ra"), n_groups=2, salt_partitions=4)
    run_extraction(spark, pages_dir, str(tmp_path / "b"), str(tmp_path / "rb"), n_groups=8, salt_partitions=32)
    assert _output_fingerprint(spark, str(tmp_path / "a")) == _output_fingerprint(spark, str(tmp_path / "b"))


def test_kind_mix_and_no_errors(spark, pages_dir):
    out = extract_pages(read_pages(spark, pages_dir))
    kinds = {r["kind"]: r["n"] for r in out.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    # corpus v10 plants exactly ONE deliberate error row: the /Encrypt'd
    # PDF, which must surface LABELED — no other document may error
    errs = out.filter(F.col("kind") == "error").select("url", "error").collect()
    assert [(("pdf-encrypted" in r.url), r.error) for r in errs] == [(True, "encrypted")]
    assert kinds.get("html", 0) > 0 and kinds.get("pdf", 0) > 0 and kinds.get("empty", 0) >= 3


def test_duplicate_payload_same_hash_distinct_urls(spark, pages_dir):
    out = extract_pages(read_pages(spark, pages_dir))
    dups = out.filter(F.col("url").rlike("dup-[ab]")).select("url", "doc_hash", "text").collect()
    assert len(dups) == 2
    assert dups[0]["doc_hash"] == dups[1]["doc_hash"]
    assert dups[0]["text"] == dups[1]["text"] != ""


def test_outlier_salting_byte_identical(spark, pages_dir):
    """heavy_bytes>0 (outlier-only salting: light rows stay scan-aligned,
    giant rows shuffle) must produce the same rows as the default full
    salted repartition — routing is physical-plan-only."""
    full = extract_pages(read_pages(spark, pages_dir), salt_partitions=8)
    split = extract_pages(
        read_pages(spark, pages_dir), salt_partitions=8, heavy_bytes=2048
    )
    a = sorted((r.url, r.doc_hash, r.text, str(r.spans)) for r in full.collect())
    b = sorted((r.url, r.doc_hash, r.text, str(r.spans)) for r in split.collect())
    assert a == b
    # the split must actually route both ways at this threshold
    n_heavy = (
        read_pages(spark, pages_dir)
        .filter("length(html) >= 2048").count()
    )
    assert 0 < n_heavy < full.count()
