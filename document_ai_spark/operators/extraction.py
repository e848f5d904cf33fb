"""The core extraction operator: Arrow-batched mapInPandas over raw payloads.

Spark re-expression of the reference's per-batch convert stage
(reference services/ai_service/add_documents.py:43-44 ->
document_conversion/docling_pdf_loader.py:26-33), per SURVEY.md U1/X2/X3:

    pages --repartition(P, salted url-hash)--> mapInPandas(extract_batch)

Design for 100 TB:
  * mapInPandas (iterator-of-batches) — pipelined, no per-partition
    materialization; one JVM<->Python Arrow exchange for the whole stage.
  * the ONLY shuffle is the explicit salted repartition, which exists to
    defuse giant-page skew (AQE cannot see inside a UDF stage); when the
    input is already well-balanced pass salt_partitions=None to avoid it.
  * per-document try/except inside the batch (kind='error' rows) — a poison
    page never fails a task, so task retries stay idempotent.
  * column pruning: only (url, warc_ts, lang, html) enter the exchange.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from document_ai_spark.functions.hashing import salted_bucket

SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("block_id", T.IntegerType()),
            T.StructField("char_start", T.LongType()),
            T.StructField("char_end", T.LongType()),
            T.StructField("tag", T.StringType()),
            T.StructField("text_density", T.DoubleType()),
            T.StructField("link_density", T.DoubleType()),
        ]
    )
)

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("lang", T.StringType()),
        T.StructField("doc_hash", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("spans", SPAN_TYPE),
        T.StructField("n_chars", T.LongType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("error", T.StringType()),
        T.StructField("bytes_in", T.LongType()),
    ]
)


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # import inside the worker so the closure pickles only names, not modules
    from document_ai_spark.kernel.extract import extract_document

    for pdf in batches:
        n = len(pdf)
        out = {
            "url": pdf["url"].tolist(),
            "warc_ts": pdf["warc_ts"].tolist(),
            "lang": pdf["lang"].tolist(),
            "doc_hash": [None] * n,
            "kind": [None] * n,
            "text": [None] * n,
            "spans": [None] * n,
            "n_chars": [0] * n,
            "n_blocks": [0] * n,
            "error": [None] * n,
            "bytes_in": [0] * n,
        }
        payloads = pdf["html"].tolist()
        for i, payload in enumerate(payloads):
            b = bytes(payload) if payload is not None else b""
            doc_hash, kind, text, spans, n_chars, n_blocks, err = extract_document(b)
            out["doc_hash"][i] = doc_hash
            out["kind"][i] = kind
            out["text"][i] = text
            out["spans"][i] = [
                (
                    s["block_id"],
                    s["char_start"],
                    s["char_end"],
                    s["tag"],
                    s["text_density"],
                    s["link_density"],
                )
                for s in spans
            ]
            out["n_chars"][i] = n_chars
            out["n_blocks"][i] = n_blocks
            out["error"][i] = err
            out["bytes_in"][i] = len(b)
        yield pd.DataFrame(out)


def extract_pages(
    pages: DataFrame,
    salt_partitions: int | None = None,
    salt: int = 0,
    heavy_bytes: int = 0,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang, ...) -> extracted DataFrame.

    ``salt_partitions``: when set, rows are salted-repartitioned on
    url-hash (SURVEY.md X2) so skewed giant pages spread evenly across
    tasks AND reduce-task count decouples from the scan's file-split
    layout. With the default ``heavy_bytes=0`` the whole input moves
    through one exchange (the north-rule shape: one full balancing
    shuffle, one scan). Setting ``heavy_bytes>0`` switches to outlier-only
    salting: only payloads >= heavy_bytes are shuffled while the bulk
    keeps scan-aligned partitioning — saves shuffle volume when the giant
    tail is rare, at the cost of a second pass over the scan (two filter
    branches), so prefer it only when shuffle bandwidth, not scan I/O, is
    the cluster bottleneck. Routing and bucketing are pure functions of
    (url, payload length), so output is independent of physical
    partitioning (byte-identity invariant).
    """
    cols = ["url", "warc_ts", "lang", "html"]  # explicit pruning before UDF
    df = pages.select(*cols)
    if salt_partitions:
        bucketed = salted_bucket(F.col("url"), salt_partitions, salt)
        if heavy_bytes > 0:
            size = F.coalesce(F.length("html"), F.lit(0))
            light = df.filter(size < heavy_bytes)
            heavy = df.filter(size >= heavy_bytes).repartition(salt_partitions, bucketed)
            df = light.unionByName(heavy)
        else:
            df = df.repartition(salt_partitions, bucketed)
    out = df.mapInPandas(_extract_batches, schema=EXTRACTED_SCHEMA)
    return out.withColumn("warc_day", F.date_format("warc_ts", "yyyy-MM-dd"))
