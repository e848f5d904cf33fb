"""Collection maintenance sinks (SURVEY.md S5/S7/J4/X7): append, reset,
delete-by-hash, force-readd — reference analogs of ChromaDB collection ops
(services/ai_service/main.py:64-72,125-126,186-198)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from document_ai_spark.sinks.collection import (
    append_chunks,
    delete_by_hash,
    force_readd,
    read_collection,
    reset_collection,
)


def _chunks(spark, ids):
    return spark.createDataFrame(
        [(f"h{i}", f"url{i}", f"text {i}") for i in ids],
        "doc_hash string, url string, chunk_text string",
    )


def test_append_and_reset(spark, tmp_path):
    path = os.path.join(str(tmp_path), "col")
    append_chunks(_chunks(spark, range(5)), path)
    append_chunks(_chunks(spark, range(5, 8)), path)
    assert read_collection(spark, path).count() == 8
    reset_collection(spark, path, like=_chunks(spark, []))
    df = read_collection(spark, path)
    assert df.count() == 0
    assert df.columns == ["doc_hash", "url", "chunk_text"]


def test_delete_by_hash(spark, tmp_path):
    path = os.path.join(str(tmp_path), "col")
    append_chunks(_chunks(spark, range(10)), path)
    doomed = spark.createDataFrame([("h2",), ("h7",), ("h404",)], "doc_hash string")
    n = delete_by_hash(spark, path, doomed)
    assert n == 2
    left = {r.doc_hash for r in read_collection(spark, path).collect()}
    assert left == {f"h{i}" for i in range(10)} - {"h2", "h7"}


def test_force_readd_replaces_matching_hashes(spark, tmp_path):
    path = os.path.join(str(tmp_path), "col")
    append_chunks(_chunks(spark, range(6)), path)
    replacement = spark.createDataFrame(
        [("h3", "url3", "REWRITTEN"), ("h9", "url9", "fresh")],
        "doc_hash string, url string, chunk_text string",
    )
    counters = force_readd(spark, path, replacement)
    assert counters == {"deleted": 1, "added": 2}
    rows = {(r.doc_hash, r.chunk_text) for r in read_collection(spark, path).collect()}
    assert ("h3", "REWRITTEN") in rows
    assert ("h3", "text 3") not in rows
    assert ("h9", "fresh") in rows
    assert read_collection(spark, path).count() == 7
