"""Chunk splitting: 1 document row -> N chunk rows (SURVEY.md U2/T4/F6).

Capability analog of the reference's markdown splitter
(reference services/ai_service/document_conversion/document_splitter.py:17-33:
langchain MarkdownTextSplitter, chunk_size=4000 chars, overlap=200, and
chunk ids f"{file_path}_chunk_{i}" at :31). Two implementations:

1. ``chunk_fixed`` — sliding char window entirely in JVM-side column
   expressions (sequence/transform/substring + explode). Zero Python in the
   plan => whole-stage codegen, scales linearly; the oracle-checked default.

2. ``chunk_markdown`` — boundary-aware variant (prefers splitting at
   paragraph/newline/sentence/space boundaries within the window, like the
   reference's recursive splitter) as an Arrow-batched pandas UDF. Python
   oracle in tests; use when chunk boundaries must respect structure.

Both emit: chunk_index, chunk_id = "{id}_chunk_{i}", chunk_text,
char_start, char_end (offsets into the input text; text[start:end] == chunk).
"""

from __future__ import annotations

from typing import List

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHUNK_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("chunk_index", T.IntegerType()),
            T.StructField("chunk_text", T.StringType()),
            T.StructField("char_start", T.LongType()),
            T.StructField("char_end", T.LongType()),
        ]
    )
)


def _fixed_chunks_col(text: Column, chunk_size: int, overlap: int) -> Column:
    step = chunk_size - overlap
    if step <= 0:
        raise ValueError("chunk_size must exceed overlap")
    n = F.length(text)
    n_chunks = (F.floor((n - F.lit(1)) / F.lit(step)) + F.lit(1)).cast("int")
    idx = F.when(n > 0, F.sequence(F.lit(0), n_chunks - F.lit(1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.struct(
            i.cast("int").alias("chunk_index"),
            F.substring(text, i * step + 1, chunk_size).alias("chunk_text"),
            (i * step).cast("long").alias("char_start"),
            F.least(i.cast("long") * step + chunk_size, n.cast("long")).alias("char_end"),
        ),
    )


def chunk_fixed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    chunk_size: int = 4000,
    overlap: int = 200,
) -> DataFrame:
    """Explode df into chunk rows using the JVM-only sliding window.

    Output: all original non-text columns + (chunk_index, chunk_id,
    chunk_text, char_start, char_end). Empty/null text -> zero rows
    (matches the reference: no chunks from an empty document).
    """
    chunks = _fixed_chunks_col(F.col(text_col), chunk_size, overlap)
    keep = [c for c in df.columns if c != text_col]
    out = df.select(*keep, F.explode(chunks).alias("c"))
    return out.select(
        *keep,
        F.col("c.chunk_index").alias("chunk_index"),
        F.concat_ws("_chunk_", F.col(id_col).cast("string"), F.col("c.chunk_index")).alias(
            "chunk_id"
        ),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.char_start").alias("char_start"),
        F.col("c.char_end").alias("char_end"),
    )


# ---------------------------------------------------------------------------
# heading-structure chunking (JVM-only; the markdown-mode counterpart)


def chunk_by_heading(df: DataFrame, text_col: str = "text", id_col: str = "url") -> DataFrame:
    """Split structure-marked text at markdown heading boundaries: each
    chunk is a heading plus its following content, until the next heading
    (the MarkdownHeaderTextSplitter shape — reference parity for
    document_splitter.py's structure-aware chunking over
    export_to_markdown output).

    Formulation is lookahead-free so the DuckDB oracle can mirror it in
    RE2: any pre-existing U+0001 is STRIPPED (it is the split sentinel;
    offsets refer to the cleaned text), then the boundary string
    "\\n\\n#" is literal-replaced with "\\x01#" and split on \\x01.
    Offsets are computed PER ROW with higher-order array functions
    (transform + slice/aggregate prefix sums) — no window, hence NO
    SHUFFLE and no cross-row state: rows sharing an ``id_col`` value
    cannot corrupt each other's offsets (their chunk_ids still collide —
    id_col must identify the row, same contract as chunk_fixed). Offsets
    re-add the removed "\\n\\n" separators, so
    ``cleaned_text[char_start:char_end] == chunk_text``. Empty/null
    text -> zero rows.
    """
    cleaned = F.replace(F.col(text_col), F.lit("\x01"), F.lit(""))
    keep = [c for c in df.columns if c != text_col]
    with_parts = (
        df.select(
            *keep,
            F.split(F.replace(cleaned, F.lit("\n\n#"), F.lit("\x01#")), "\x01").alias(
                "_parts"
            ),
            F.length(cleaned).alias("_len"),
        )
        .filter(F.col("_len") > 0)
    )
    parts = F.col("_parts")
    # prefix-sum offsets per element: chunks-per-doc is small, so the
    # O(chunks^2) slice+aggregate stays trivial and entirely codegen'd
    structs = F.transform(
        parts,
        lambda x, i: F.struct(
            i.cast("int").alias("chunk_index"),
            x.alias("chunk_text"),
            (
                F.aggregate(
                    F.slice(parts, F.lit(1), i),
                    F.lit(0).cast("long"),
                    lambda a, y: a + F.length(y),
                )
                + i.cast("long") * 2
            ).alias("char_start"),
        ),
    )
    out = with_parts.select(*keep, F.explode(structs).alias("c"))
    return out.select(
        *keep,
        F.col("c.chunk_index").alias("chunk_index"),
        F.concat_ws("_chunk_", F.col(id_col).cast("string"), F.col("c.chunk_index")).alias(
            "chunk_id"
        ),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.char_start").alias("char_start"),
        (F.col("c.char_start") + F.length("c.chunk_text")).cast("long").alias("char_end"),
    )


# ---------------------------------------------------------------------------
# boundary-aware variant (pandas UDF)

# (separator, chars of it that BELONG to the ending chunk): a heading
# boundary cuts BEFORE the '#', so the heading starts the next chunk —
# the reference's markdown splitter keeps headings with their section
_BOUNDARY_SEPS = [("\n\n#", 2), ("\n\n", 2), ("\n", 1), (". ", 2), (" ", 1)]


def split_markdown_py(text: str, chunk_size: int = 4000, overlap: int = 200) -> List[tuple]:
    """Pure-Python oracle for the boundary-aware splitter.

    Windows of at most chunk_size chars; each window end is pulled back to
    the best boundary in its second half — heading starts first (so
    sections stay whole), then paragraph/newline/sentence/space; next
    window starts `overlap` chars before the previous end. Deterministic,
    O(n)."""
    if not text:
        return []
    out = []
    start = 0
    i = 0
    n = len(text)
    while start < n:
        end = min(start + chunk_size, n)
        if end < n:
            window = text[start:end]
            half = chunk_size // 2
            cut = -1
            for sep, keep_chars in _BOUNDARY_SEPS:
                p = window.rfind(sep)
                if p >= half:
                    cut = p + keep_chars
                    break
            if cut > 0:
                end = start + cut
        out.append((i, text[start:end], start, end))
        if end >= n:
            break
        start = max(end - overlap, start + 1)
        i += 1
    return out


def chunk_markdown_udf(chunk_size: int = 4000, overlap: int = 200):
    @F.pandas_udf(CHUNK_STRUCT)
    def _udf(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: split_markdown_py(t or "", chunk_size, overlap)
        )

    return _udf


def chunk_markdown(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    chunk_size: int = 4000,
    overlap: int = 200,
) -> DataFrame:
    chunks = chunk_markdown_udf(chunk_size, overlap)(F.col(text_col))
    keep = [c for c in df.columns if c != text_col]
    out = df.select(*keep, F.explode(chunks).alias("c"))
    return out.select(
        *keep,
        F.col("c.chunk_index").alias("chunk_index"),
        F.concat_ws("_chunk_", F.col(id_col).cast("string"), F.col("c.chunk_index")).alias(
            "chunk_id"
        ),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.char_start").alias("char_start"),
        F.col("c.char_end").alias("char_end"),
    )
