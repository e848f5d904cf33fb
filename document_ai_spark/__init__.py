"""document_ai_spark — a PySpark-native main-content extraction engine.

Brand-new implementation (NOT a port) of the query / data-processing
capabilities of the reference Document-AI system (DanielMaurer02/Document-AI,
read-only snapshot at /root/reference): scan -> dedup -> convert -> split ->
enrich -> embed -> upsert, plus retrieve -> rerank -> format, re-expressed as
lazy Spark DataFrame plans per SURVEY.md.

Layout:
  kernel/     pure-Python deterministic extraction kernels (no Spark imports)
  operators/  DataFrame-level operators (extraction, dedup, chunking, topk, ...)
  functions/  column functions + pandas UDFs (blake2b, embed, scalars)
  sources/    synthetic pages corpus generator + table readers
  plans/      end-to-end pipeline assembly, checkpoint/resume protocol
  streaming/  incremental (Structured Streaming) path
"""

__version__ = "0.1.0"
