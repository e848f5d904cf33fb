"""WARC source connector: record codec + Spark reader + extraction parity
(sources/warc.py — Common Crawl's native format, per-file parallelism)."""

import datetime as dt

from pyspark.sql import functions as F

from document_ai_spark.sources.warc import (
    parse_records,
    read_warc,
    write_pages_warc,
    write_record,
)


def test_record_roundtrip_including_binary_payload():
    # payload containing CRLFs and a fake record header must survive:
    # Content-Length delimits, not pattern matching
    evil = b"x\r\n\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\nyyy" + bytes(range(256))
    blob = write_record("https://e.com/a", dt.datetime(2024, 3, 2, 5, 6, 7), evil, "en")
    blob += write_record("https://e.com/b", dt.datetime(2024, 3, 3, 0, 0, 0), b"second", "de")
    recs = list(parse_records(blob))
    assert [(r[0], r[3]) for r in recs] == [("https://e.com/a", "en"), ("https://e.com/b", "de")]
    assert recs[0][2] == evil and recs[1][2] == b"second"
    assert recs[0][1] == dt.datetime(2024, 3, 2, 5, 6, 7)


def test_truncated_and_garbage_blobs_are_isolated():
    assert list(parse_records(b"")) == []
    assert list(parse_records(b"not a warc at all")) == []
    good = write_record("https://e.com/x", dt.datetime(2024, 1, 1), b"ok", "en")
    # good record followed by a truncated one: the good one still parses
    trunc = write_record("https://e.com/y", dt.datetime(2024, 1, 1), b"payload", "en")[:-12]
    recs = list(parse_records(good + trunc))
    assert len(recs) == 1 and recs[0][2] == b"ok"


def test_warc_extraction_matches_parquet_path(spark, pages_dir, tmp_path):
    """The same corpus via WARC must extract byte-identically to the
    Parquet path (the north rule's invariant extends across sources)."""
    from document_ai_spark.operators.extraction import extract_pages
    from document_ai_spark.plans.pipeline import read_pages

    warc_dir = str(tmp_path / "warc")
    n = write_pages_warc(warc_dir, 200, seed=42, docs_per_file=60)
    assert n == 200

    via_warc = extract_pages(read_warc(spark, warc_dir), salt_partitions=8)
    via_parquet = extract_pages(read_pages(spark, pages_dir), salt_partitions=8)

    def fp(df):
        return sorted(
            (r.url, r.doc_hash, r.kind, r.text) for r in
            df.select("url", "doc_hash", "kind", "text").collect()
        )

    assert fp(via_warc) == fp(via_parquet)

    # warc_day partition column derived identically
    days = {r.warc_day for r in via_warc.select("warc_day").distinct().collect()}
    assert len(days) == 4


def test_gzipped_warc_reads_identically(spark, tmp_path):
    """Common Crawl ships .warc.gz with per-record gzip members — the
    reader must see the same rows as the plain file."""
    import gzip

    from document_ai_spark.sources.pages import generate_rows

    plain_dir, gz_dir = str(tmp_path / "plain"), str(tmp_path / "gz")
    import os as _os
    _os.makedirs(plain_dir); _os.makedirs(gz_dir)
    rows = list(generate_rows(60, seed=9))
    recs = [write_record(r["url"], r["warc_ts"], r["html"] or b"", r["lang"]) for r in rows]
    with open(_os.path.join(plain_dir, "a.warc"), "wb") as f:
        f.write(b"".join(recs))
    # per-record gzip members, concatenated (the Common Crawl layout)
    with open(_os.path.join(gz_dir, "a.warc.gz"), "wb") as f:
        for rec in recs:
            f.write(gzip.compress(rec))

    def fp(d):
        return sorted(
            (r.url, bytes(r.html or b"")) for r in read_warc(spark, d).collect()
        )

    a, b = fp(plain_dir), fp(gz_dir)
    assert a == b and len(a) == 60
