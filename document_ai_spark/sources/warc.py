"""WARC source connector: Common Crawl's native archive format.

The engine's primary input is an Iceberg/Parquet ``pages`` table, but raw
web crawls arrive as WARC files (ISO 28500: text headers + byte payload
per record). This module provides a from-scratch reader and a
deterministic writer (no warcio in this environment; the format is simple
enough that a dependency would add risk, not capability):

    record  := "WARC/1.0\\r\\n" header-lines "\\r\\n" payload "\\r\\n\\r\\n"
    header  := "Name: value\\r\\n"   (Content-Length delimits the payload —
                                     payload bytes may contain anything)

Reading strategy for Spark: WARC files are NOT splittable (a record can
straddle any byte offset, and gzip members would need per-record framing),
so parallelism is per-FILE: ``spark.read.format("binaryFile")`` lists the
files, and an Arrow-batched ``mapInArrow`` stage parses each file's
records. This is exactly the case the extraction operator's input-side
salting exists for (``extract_pages(salt_partitions=...)``): after parsing,
rows are salted-repartitioned so giant files/pages spread across tasks.
At crawl scale, one WARC file is ~1 GB => tens of thousands of files =>
file-level parallelism saturates any executor count; record parsing
streams within each task.

Output schema == the pages table (url, warc_ts, html, text, lang,
warc_day), so ``extract_pages(read_warc(...))`` is a drop-in for the
Parquet path — byte-identical extraction either way (tested roundtrip).
"""

from __future__ import annotations

import datetime as dt
import os
from typing import Iterator, List, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"

WARC_PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


# ---------------------------------------------------------------------------
# record-level codec (pure functions; used by both writer and reader)


def write_record(url: str, ts: dt.datetime, payload: bytes, lang: str = "") -> bytes:
    """Serialize one response record. WARC-Date is ISO-8601 Z; the engine's
    determinism rule holds — ts is data, never wall clock."""
    headers = [
        b"WARC/1.0",
        b"WARC-Type: response",
        b"WARC-Target-URI: " + url.encode("utf-8"),
        b"WARC-Date: " + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode("ascii"),
        (b"WARC-Identified-Content-Language: " + lang.encode("ascii")) if lang else None,
        b"Content-Length: " + str(len(payload)).encode("ascii"),
    ]
    head = _CRLF.join(h for h in headers if h is not None)
    return head + _CRLF + _CRLF + payload + _CRLF + _CRLF


def parse_records(blob: bytes) -> Iterator[Tuple[str, dt.datetime, bytes, str]]:
    """Yield (url, ts, payload, lang) for every response record in a WARC
    blob. Content-Length delimits payloads (they may contain 'WARC/1.0');
    a malformed record ends parsing of the remainder of THIS file only —
    per-file error isolation, same contract as per-document extraction."""
    pos = 0
    n = len(blob)
    while pos < n:
        start = blob.find(b"WARC/1.0", pos)
        if start == -1:
            return
        head_end = blob.find(_CRLF + _CRLF, start)
        if head_end == -1:
            return
        headers = {}
        for line in blob[start:head_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            if v:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers[b"content-length"])
        except (KeyError, ValueError):
            return
        body_start = head_end + 4
        payload = blob[body_start : body_start + length]
        if len(payload) < length:
            return  # truncated record
        pos = body_start + length
        if headers.get(b"warc-type", b"") == b"response":
            url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
            lang = headers.get(b"warc-identified-content-language", b"").decode("ascii", "replace")
            raw_date = headers.get(b"warc-date", b"1970-01-01T00:00:00Z").decode("ascii", "replace")
            try:
                ts = dt.datetime.strptime(raw_date, "%Y-%m-%dT%H:%M:%SZ")
            except ValueError:
                ts = dt.datetime(1970, 1, 1)
            yield url, ts, payload, lang


# ---------------------------------------------------------------------------
# writer (synthetic corpus -> .warc files)


def write_pages_warc(out_dir: str, n_docs: int, seed: int = 42, docs_per_file: int = 500) -> int:
    """Write the deterministic synthetic pages corpus as .warc files
    (docs_per_file records each) — the WARC twin of write_pages_parquet,
    same (seed, n_docs) => same logical rows."""
    from document_ai_spark.sources.pages import generate_rows

    os.makedirs(out_dir, exist_ok=True)
    count = 0
    buf: List[bytes] = []
    file_idx = 0

    def _flush() -> None:
        nonlocal file_idx
        if not buf:
            return
        with open(os.path.join(out_dir, f"part-{file_idx:05d}.warc"), "wb") as f:
            f.write(b"".join(buf))
        file_idx += 1

    for row in generate_rows(n_docs, seed=seed):
        buf.append(
            write_record(row["url"], row["warc_ts"], row["html"] or b"", row["lang"])
        )
        count += 1
        if len(buf) >= docs_per_file:
            _flush()
            buf = []
    _flush()
    return count


# ---------------------------------------------------------------------------
# reader (.warc files -> pages DataFrame)


def read_warc(spark: SparkSession, warc_dir: str) -> DataFrame:
    """WARC files -> pages-schema DataFrame.

    binaryFile scan lists files (one row per file, content in memory —
    crawl WARCs are ~1 GB, sized for exactly this); an Arrow stage parses
    records. Parallelism is per-file (non-splittable format); pipe the
    result through ``extract_pages(salt_partitions=...)`` to rebalance."""
    import pyarrow as pa

    def _parse(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import gzip

        for batch in batches:
            names = batch.schema.names
            contents = batch.column(names.index("content"))
            paths = batch.column(names.index("path"))
            urls: List[str] = []
            tss: List[dt.datetime] = []
            payloads: List[bytes] = []
            langs: List[str] = []
            for path, blob in zip(paths, contents):
                raw = blob.as_py() or b""
                if str(path).endswith(".gz"):
                    # Common Crawl ships .warc.gz as CONCATENATED per-record
                    # gzip members; GzipFile reads through all members
                    import io

                    try:
                        raw = gzip.GzipFile(fileobj=io.BytesIO(raw)).read()
                    except OSError:
                        continue  # corrupt archive: isolate this file
                for url, ts, payload, lang in parse_records(raw):
                    urls.append(url)
                    tss.append(ts)
                    payloads.append(payload)
                    langs.append(lang or None)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(urls, pa.string()),
                    pa.array(tss, pa.timestamp("us")),
                    pa.array(payloads, pa.binary()),
                    pa.array([None] * len(urls), pa.string()),  # text: unused
                    pa.array(langs, pa.string()),
                ],
                names=["url", "warc_ts", "html", "text", "lang"],
            )

    files = spark.read.format("binaryFile").load(os.path.join(warc_dir, "*.warc*"))
    pages = files.select("path", "content").mapInArrow(_parse, schema=WARC_PAGE_SCHEMA)
    return pages.withColumn("warc_day", F.date_format("warc_ts", "yyyy-MM-dd"))
