"""Collection (chunk-store) maintenance sinks: append, reset, force-readd.

Capability analogs of the reference's ChromaDB collection operations:
  * append_chunks  — vectorstore.add_texts upsert
    (reference services/ai_service/add_documents.py:64-67)
  * reset_collection — delete + recreate the collection
    (reference services/ai_service/main.py:64-72, app.py:269-275)
  * delete_by_hash / force_readd — find ids where file_hash matches and
    delete them so a doc can be re-added
    (reference services/ai_service/main.py:125-126,186-198)

Local storage is Parquet; on a cluster these become Iceberg statements —
the Iceberg SQL equivalent is noted per function. The Parquet fallback for
deletion is rewrite-via-anti-join: read, LEFT ANTI JOIN the doomed keys,
overwrite. At Iceberg scale that is `MERGE INTO ... WHEN MATCHED THEN
DELETE` / `DELETE FROM`, which rewrites only the touched files.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def append_chunks(df: DataFrame, path: str) -> None:
    """Append chunk rows to the collection (Iceberg: `df.writeTo(t).append()`)."""
    df.write.mode("append").parquet(path)


def read_collection(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def reset_collection(spark: SparkSession, path: str, like: DataFrame | None = None) -> None:
    """Drop and recreate empty (S7). Iceberg: DROP TABLE + CREATE TABLE.

    ``like``: optional DataFrame whose schema seeds the empty collection so
    readers of a just-reset collection still see the expected columns.
    """
    shutil.rmtree(path, ignore_errors=True)
    if like is not None:
        like.limit(0).write.mode("overwrite").parquet(path)


def delete_by_hash(spark: SparkSession, path: str, hashes: DataFrame, hash_col: str = "doc_hash") -> int:
    """Delete every row whose ``hash_col`` appears in ``hashes`` (J4/X7).

    Iceberg: `DELETE FROM t WHERE doc_hash IN (SELECT ...)`. Parquet
    fallback: rewrite via LEFT ANTI JOIN into a temp dir, then atomic-ish
    swap (write-then-rename keeps readers from seeing a half-deleted
    state). Returns the number of rows deleted.
    """
    cur = spark.read.parquet(path)
    doomed = hashes.select(F.col(hash_col)).distinct()
    kept = cur.join(F.broadcast(doomed), hash_col, "left_anti")
    n_before = cur.count()
    tmp = tempfile.mkdtemp(prefix="collection_rewrite_", dir=os.path.dirname(path.rstrip("/")))
    kept.write.mode("overwrite").parquet(tmp)
    n_after = spark.read.parquet(tmp).count()
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_before - n_after


def force_readd(
    spark: SparkSession, path: str, new_chunks: DataFrame, hash_col: str = "doc_hash"
) -> dict:
    """Delete-then-append (the reference's force_readd=True path): any
    existing rows sharing a hash with ``new_chunks`` are removed, then the
    new rows are appended. Iceberg: one MERGE. Returns counters."""
    deleted = delete_by_hash(
        spark, path, new_chunks.select(hash_col).distinct(), hash_col
    )
    added = new_chunks.count()
    append_chunks(new_chunks, path)
    return {"deleted": deleted, "added": added}
