"""Retrieval query path: top-k -> deterministic rerank -> context fold.

Spark re-expression of the reference's RAG chain (SURVEY.md §3.2):
retrieve k=7 by cosine (reference services/ai_service/query_llm.py:33-35)
-> LLM listwise rerank (:40-43, replaced by a deterministic lexical-overlap
rescorer for testability) -> format_docs context fold
(reference services/ai_service/utils/query.py:69-101: "\n\n"-joined, each
chunk suffixed "[Source: path, Chunk: id]"). The LLM generation step is an
external model service, out of data-plane scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from document_ai_spark.functions.embed import cosine_sim, embed_text_py
from document_ai_spark.operators.textstats import token_count


def retrieve_topk(
    chunks: DataFrame, query: str, k: int = 7,
    vec_col: str = "embedding", id_col: str = "chunk_id",
) -> DataFrame:
    """Embed the query (driver-side, same hashed-feature function as the
    corpus) and take exact cosine top-k."""
    qv = embed_text_py(query)
    q = F.array(*[F.lit(float(x)) for x in qv])
    return (
        chunks.withColumn("score", F.round(cosine_sim(F.col(vec_col), q), 4))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def lexical_rerank(
    retrieved: DataFrame, query: str, text_col: str = "chunk_text", id_col: str = "chunk_id"
) -> DataFrame:
    """Deterministic stand-in for the reference's LLM listwise rerank:
    rescore by query-term overlap (count of query tokens present in the
    chunk / #query tokens), then re-sort by (rerank_score, score)."""
    terms = sorted({t.lower() for t in query.split() if t})
    if not terms:
        return retrieved.withColumn("rerank_score", F.lit(0.0))
    hits = None
    for t in terms:
        h = F.when(F.lower(F.col(text_col)).contains(t), 1).otherwise(0)
        hits = h if hits is None else hits + h
    out = retrieved.withColumn("rerank_score", F.round(hits / F.lit(len(terms)), 4))
    return out.orderBy(F.desc("rerank_score"), F.desc("score"), F.asc(id_col))


def format_docs(
    retrieved: DataFrame, text_col: str = "chunk_text",
    source_col: str = "url", id_col: str = "chunk_id",
    order_col: str = "score",
) -> DataFrame:
    """Order-sensitive context fold (A5): one row with the prompt context:
    chunks sorted by score desc, formatted
    '{text}\n[Source: {source}, Chunk: {id}]' and joined with '\n\n'."""
    formatted = retrieved.select(
        F.col(order_col),
        F.col(id_col),
        F.format_string(
            "%s\n[Source: %s, Chunk: %s]",
            F.col(text_col),
            F.col(source_col),
            F.col(id_col),
        ).alias("fmt"),
    )
    return formatted.agg(
        F.concat_ws(
            "\n\n",
            F.array_sort(
                F.collect_list(F.struct(F.col(order_col).alias("s"), F.col(id_col).alias("i"), F.col("fmt"))),
                lambda a, b: F.when(a["s"] > b["s"], -1)
                .when(a["s"] < b["s"], 1)
                .when(a["i"] < b["i"], -1)
                .when(a["i"] > b["i"], 1)
                .otherwise(0),
            ).getField("fmt"),
        ).alias("context")
    )
